"""t-SNE and training-report visualization tests (reference tsne.py +
misc/generate_report.py; neither had coverage)."""

import os

import numpy as np

from video_similarity_search_tpu.evaluation.report import (
    parse_scalar_log, parse_train_log, parse_val_log,
    plot_training_progress)
from video_similarity_search_tpu.evaluation.tsne import tsne_plot


def test_tsne_plot_writes_png(tmp_path):
    rng = np.random.default_rng(0)
    emb = rng.normal(size=(60, 16)).astype(np.float32)
    labels = np.repeat(np.arange(6), 10)
    out = tsne_plot(emb, labels, out_path=str(tmp_path / "tsne.png"),
                    n_classes=4, perplexity=5.0,
                    idx_to_class={i: f"c{i}" for i in range(6)})
    assert os.path.exists(out)


def test_report_parses_and_plots(tmp_path):
    logs = tmp_path / "tnet_checkpoints"
    os.makedirs(str(logs))
    with open(str(logs / "train_loss_and_acc.txt"), "w") as f:
        f.write("epoch:0 runtime:0.01 1.5\nepoch:1 runtime:0.01 1.2\n")
    with open(str(logs / "val_loss_and_acc.txt"), "w") as f:
        f.write("epoch:0 0.9 0.5 0.41 0.77\nepoch:1 0.7 0.6 0.55 0.81\n")
    with open(str(logs / "NMIs.txt"), "w") as f:
        f.write("0.31\n0.44\n")
    with open(str(logs / "AMIs.txt"), "w") as f:
        f.write("0.29\n0.40\n")

    train = parse_train_log(str(logs / "train_loss_and_acc.txt"))
    assert train["epoch"] == [0, 1] and train["loss"] == [1.5, 1.2]
    val = parse_val_log(str(logs / "val_loss_and_acc.txt"))
    assert val["top1"] == [0.41, 0.55]
    assert parse_scalar_log(str(logs / "NMIs.txt")) == [0.31, 0.44]

    out = plot_training_progress(str(tmp_path),
                                 out_png=str(tmp_path / "report.png"))
    assert out and os.path.exists(out)
