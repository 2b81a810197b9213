"""Full evaluate-CLI smoke on synthetic data: retrieval + caches +
exemplar plot + temporal heat map (reference evaluate.py:486-585)."""

import os
import subprocess
import sys

import pytest

from synthetic_data import make_synthetic_ucf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_evaluate_cli_end_to_end(tmp_path):
    vid_path, ann_path = make_synthetic_ucf(str(tmp_path / "data"),
                                        videos_per_class=5,
                                        with_test=True)
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "MODEL:\n  ARCH: 3dresnet\nRESNET:\n  MODEL_DEPTH: 10\n"
        "  HIDDEN_LAYER: 32\n  OUT_DIM: 8\n"
        "DATA:\n  SAMPLE_SIZE: 16\n  SAMPLE_DURATION: 4\n"
        "TRAIN:\n  DATASET: ucf101\n"
        f"DATASET:\n  VID_PATH: '{vid_path}'\n"
        f"  ANNOTATION_PATH: '{ann_path}'\n"
        "TPU:\n  COMPUTE_DTYPE: float32\n")
    out = str(tmp_path / "out")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "cli", "evaluate.py"),
         "--cfg", str(cfg), "--output", out, "--plot",
         "--heatmap", "0,1"],
        capture_output=True, text=True, timeout=500, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(os.path.join(out, "test_embeddings.pkl"))
    assert os.path.exists(os.path.join(out, "train_embeddings.pkl"))
    assert os.path.exists(os.path.join(out, "tnet_checkpoints",
                                       "global_retrieval_acc.txt"))
    assert os.path.exists(os.path.join(out, "exemplar_retrievals.png"))
    assert os.path.exists(os.path.join(out, "temporal_heat_map.png"))
