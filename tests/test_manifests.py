"""Manifest parser tests (Kinetics class-map stability, VERDICT item 8)."""

import os

from video_similarity_search_tpu.data.manifests import (
    load_kinetics_manifest)


def _write(path, lines):
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def test_kinetics_class_map_shared_across_splits(tmp_path):
    """Train and val splits list categories in DIFFERENT orders; the label
    ids must still agree (reference derives labels from one shared
    annotation, datasets/kinetics.py:98-135)."""
    ann = tmp_path / "ann"
    os.makedirs(str(ann))
    _write(str(ann / "train.csv"), [
        "zumba/v1 32 zumba",
        "abseiling/v2 32 abseiling",
        "juggling/v3 32 juggling",
    ])
    _write(str(ann / "val.csv"), [
        "juggling/v9 32 juggling",
        "zumba/v8 32 zumba",
    ])
    train, train_map = load_kinetics_manifest(
        str(ann), str(tmp_path), "train", sample_duration=4, verbose=False)
    val, val_map = load_kinetics_manifest(
        str(ann), str(tmp_path), "val", sample_duration=4, verbose=False)
    assert train_map == val_map
    # sorted union: abseiling=0, juggling=1, zumba=2
    assert train_map == {0: "abseiling", 1: "juggling", 2: "zumba"}
    assert train[0]["label"] == 2  # zumba row
    assert val[0]["label"] == 1  # juggling row


def test_kinetics_classes_file_priority(tmp_path):
    """An explicit classes.txt fixes the id order."""
    ann = tmp_path / "ann"
    os.makedirs(str(ann))
    _write(str(ann / "classes.txt"), ["zumba", "abseiling"])
    _write(str(ann / "train.csv"), ["zumba/v1 32 zumba",
                                    "abseiling/v2 32 abseiling"])
    samples, idx_to_class = load_kinetics_manifest(
        str(ann), str(tmp_path), "train", sample_duration=4, verbose=False)
    assert idx_to_class == {0: "zumba", 1: "abseiling"}
    assert samples[0]["label"] == 0
