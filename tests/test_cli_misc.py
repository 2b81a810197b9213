"""Subprocess smokes for the remaining CLI surface: coclr_classify
training (frame-JPEG path), tsne, generate_report."""

import os
import subprocess
import sys

from synthetic_data import make_synthetic_ucf

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")


def _run(args, timeout=500):
    return subprocess.run([sys.executable] + args, capture_output=True,
                          text=True, timeout=timeout, env=ENV)


import pytest


@pytest.mark.parametrize("train_what,epochs", [
    ("last", 2),
    pytest.param("ft", 1, marks=pytest.mark.slow),  # ft re-compiles the
    # full-backbone step (~2 min); the 'last' param keeps the CLI covered
])
def test_coclr_classify_training_smoke(tmp_path, train_what, epochs):
    """Linear-probe / finetune epochs on synthetic frames: CE loss trains,
    a best checkpoint lands; 'ft' exercises the lr/10 backbone group
    (reference coclr_classify.py:172-196, 366-389)."""
    vid_path, ann_path = make_synthetic_ucf(str(tmp_path / "data"))
    out = str(tmp_path / "out")
    proc = _run([os.path.join(REPO, "cli", "coclr_classify.py"),
                 "--vid_path", vid_path, "--annotation_path", ann_path,
                 "--train_what", train_what, "--epochs", str(epochs),
                 "--batch_size", "4", "--seq_len", "8", "--img_dim", "32",
                 "--num_class", "3", "--lr", "0.01", "--output", out])
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "val top1" in proc.stdout
    assert os.path.exists(os.path.join(out, "tnet_checkpoints", "s3d",
                                       "model_best"))


def test_tsne_cli_smoke(tmp_path):
    vid_path, ann_path = make_synthetic_ucf(str(tmp_path / "data"))
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        "MODEL:\n  ARCH: 3dresnet\nRESNET:\n  MODEL_DEPTH: 10\n"
        "  HIDDEN_LAYER: 32\n  OUT_DIM: 8\n"
        "DATA:\n  SAMPLE_SIZE: 16\n  SAMPLE_DURATION: 4\n"
        "TRAIN:\n  DATASET: ucf101\n"
        f"DATASET:\n  VID_PATH: '{vid_path}'\n"
        f"  ANNOTATION_PATH: '{ann_path}'\n"
        "TPU:\n  COMPUTE_DTYPE: float32\n")
    out = str(tmp_path / "tsne.png")
    proc = _run([os.path.join(REPO, "cli", "tsne.py"), "--cfg", str(cfg),
                 "--output", out, "--split", "train", "--n_classes", "3"])
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(out)


def test_generate_report_cli_smoke(tmp_path):
    logs = tmp_path / "tnet_checkpoints"
    os.makedirs(str(logs))
    with open(str(logs / "train_loss_and_acc.txt"), "w") as f:
        f.write("epoch:0 runtime:0.01 1.5\nepoch:1 runtime:0.01 1.2\n")
    with open(str(logs / "val_loss_and_acc.txt"), "w") as f:
        f.write("epoch:0 0.9 0.5 0.41 0.77\n")
    proc = _run([os.path.join(REPO, "cli", "generate_report.py"),
                 "--output_path", str(tmp_path),
                 "--out_png", str(tmp_path / "report.png")], timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.path.exists(str(tmp_path / "report.png"))
