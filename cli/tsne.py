#!/usr/bin/env python
"""t-SNE embedding visualization (reference tsne.py:24-220)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser("tsne")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--output", default="tsne.png")
    parser.add_argument("--split", default="val")
    parser.add_argument("--n_classes", type=int, default=20)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.data import build_data_loader
    from video_similarity_search_tpu.evaluation import \
        get_embeddings_and_labels
    from video_similarity_search_tpu.evaluation.tsne import tsne_plot
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (create_train_state,
                                                   load_checkpoint,
                                                   merge_pretrained,
                                                   restore_train_state,
                                                   torch_resnet3d_to_flax)

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg_file)
    model = model_selector(cfg)
    sample = jnp.zeros((1, cfg.DATA.SAMPLE_DURATION, cfg.DATA.SAMPLE_SIZE,
                        cfg.DATA.SAMPLE_SIZE, cfg.DATA.INPUT_CHANNEL_NUM))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    if args.checkpoint_path:
        payload = load_checkpoint(args.checkpoint_path)
        if "torch_state_dict" in payload:
            p, s = torch_resnet3d_to_flax(payload["torch_state_dict"])
            params, stats = merge_pretrained(state.params,
                                             state.batch_stats, p, s)
            state = state.replace(params=params, batch_stats=stats)
        else:
            state, _, _ = restore_train_state(state, payload)

    loader, (dataset, idx_to_class) = build_data_loader(
        args.split, cfg, triplets=False, drop_last=False)
    emb, labels, _ = get_embeddings_and_labels(state, model, cfg, loader,
                                               split=args.split)
    out = tsne_plot(emb, labels, out_path=args.output,
                    n_classes=args.n_classes, idx_to_class=idx_to_class)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
