"""Training-curve report from txt metric logs.

Reference misc/generate_report.py:44-186: parse the append-only logs
(train_loss_and_acc.txt, val_loss_and_acc.txt, NMIs.txt, AMIs.txt,
global_retrieval_acc.txt) and render a multi-panel PNG.
"""

from __future__ import annotations

import os
import re
from typing import Dict, List, Optional

import numpy as np


def parse_train_log(path: str) -> Dict[str, List[float]]:
    """Lines like 'epoch:3 runtime:0.02 1.2345'."""
    epochs, losses, runtimes = [], [], []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                m = re.match(r"epoch:(\d+)\s+runtime:([\d.eE+-]+)\s+"
                             r"([\d.eE+-]+)", line)
                if m:
                    epochs.append(int(m.group(1)))
                    runtimes.append(float(m.group(2)))
                    losses.append(float(m.group(3)))
    return {"epoch": epochs, "runtime": runtimes, "loss": losses}


def parse_val_log(path: str) -> Dict[str, List[float]]:
    """Lines like 'epoch:3 0.9 0.5 0.41 0.77'."""
    out = {"epoch": [], "loss": [], "acc": [], "top1": [], "top5": []}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                parts = line.split()
                if not parts or not parts[0].startswith("epoch:"):
                    continue
                out["epoch"].append(int(parts[0].split(":")[1]))
                vals = [float(v) for v in parts[1:5]]
                for key, v in zip(("loss", "acc", "top1", "top5"), vals):
                    out[key].append(v)
    return out


def parse_scalar_log(path: str) -> List[float]:
    """One float per line (NMIs.txt / AMIs.txt)."""
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [float(line.strip()) for line in f if line.strip()]


def plot_training_progress(output_path: str,
                           out_png: Optional[str] = None) -> Optional[str]:
    """Render loss / triplet-acc / retrieval / NMI / AMI panels."""
    log_dir = os.path.join(output_path, "tnet_checkpoints")
    train = parse_train_log(os.path.join(log_dir, "train_loss_and_acc.txt"))
    val = parse_val_log(os.path.join(log_dir, "val_loss_and_acc.txt"))
    nmis = parse_scalar_log(os.path.join(log_dir, "NMIs.txt"))
    amis = parse_scalar_log(os.path.join(log_dir, "AMIs.txt"))

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    panels = 2 + (1 if val["top1"] else 0) + (1 if nmis else 0) + \
        (1 if amis else 0)
    fig, axes = plt.subplots(1, max(panels, 1), figsize=(4 * panels, 3.5))
    if panels == 1:
        axes = [axes]
    i = 0
    axes[i].plot(train["epoch"], train["loss"], label="train")
    if val["loss"]:
        axes[i].plot(val["epoch"], val["loss"], label="val")
    axes[i].set_title("loss")
    axes[i].legend()
    i += 1
    axes[i].plot(val["epoch"], val["acc"])
    axes[i].set_title("triplet accuracy")
    i += 1
    if val["top1"]:
        axes[i].plot(val["epoch"], val["top1"], label="top1")
        axes[i].plot(val["epoch"], val["top5"], label="top5")
        axes[i].set_title("retrieval")
        axes[i].legend()
        i += 1
    if nmis:
        axes[i].plot(nmis)
        axes[i].set_title("NMI")
        i += 1
    if amis:
        axes[i].plot(amis)
        axes[i].set_title("AMI")
        i += 1
    fig.tight_layout()
    out_png = out_png or os.path.join(log_dir, "training_progress.png")
    fig.savefig(out_png, dpi=150)
    plt.close(fig)
    return out_png
