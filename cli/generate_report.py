#!/usr/bin/env python
"""Training-curve report (reference misc/generate_report.py:113-186)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_similarity_search_tpu.evaluation.report import \
    plot_training_progress


def main():
    parser = argparse.ArgumentParser("generate_report")
    parser.add_argument("--output_path", required=True,
                        help="run OUTPUT_PATH containing tnet_checkpoints/")
    parser.add_argument("--out_png", default=None)
    args = parser.parse_args()
    out = plot_training_progress(args.output_path, args.out_png)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
