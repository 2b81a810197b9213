#!/usr/bin/env python
"""Retrieval evaluation entry point (reference evaluate.py:486-585).

    python cli/evaluate.py --cfg configs/resnet_ucf_itercluster_flow.yaml \
        --checkpoint_path <ckpt> --output <dir>

Builds the encoder, loads the checkpoint (orbax dir or torch .pth.tar),
embeds train+test splits (test = sliding-window averaged), and reports
top-1/5/10/20 cosine retrieval.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_similarity_search_tpu.utils.compile_cache import \
    enable_compile_cache

enable_compile_cache()


def main():
    parser = argparse.ArgumentParser("evaluate")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--checkpoint_path", default=None)
    parser.add_argument("--output", default=None)
    parser.add_argument("--gpu", default=None, help="ignored on TPU")
    parser.add_argument("--crop", default="avg",
                        help="center|avg (test window handling)")
    parser.add_argument("--heatmap", default=None, metavar="EX_IDX,TEST_IDX",
                        help="write a temporal similarity heat-map PNG for "
                             "exemplar/test video indices (the intended "
                             "behavior of reference evaluate.py:402-483)")
    parser.add_argument("--plot", action="store_true",
                        help="write exemplar retrieval frames PNG "
                             "(reference evaluate.py:241-275,376-394)")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    import jax.numpy as jnp
    import jax

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.data import build_data_loader
    from video_similarity_search_tpu.evaluation.knn import k_nearest_embeddings
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (create_train_state,
                                                   load_checkpoint,
                                                   merge_pretrained,
                                                   restore_train_state,
                                                   torch_resnet3d_to_flax)

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg_file)
    if args.opts:
        cfg.merge_from_list(args.opts)
    if args.output:
        cfg.OUTPUT_PATH = args.output
    os.makedirs(cfg.OUTPUT_PATH, exist_ok=True)

    start = time.time()
    model = model_selector(cfg)
    sample = jnp.zeros((1, cfg.DATA.SAMPLE_DURATION, cfg.DATA.SAMPLE_SIZE,
                        cfg.DATA.SAMPLE_SIZE, cfg.DATA.INPUT_CHANNEL_NUM))
    state = create_train_state(jax.random.key(0), model, cfg, sample)
    if args.checkpoint_path:
        payload = load_checkpoint(args.checkpoint_path)
        if "torch_state_dict" in payload:
            p, s = torch_resnet3d_to_flax(payload["torch_state_dict"])
            params, stats = merge_pretrained(state.params, state.batch_stats,
                                             p, s)
            state = state.replace(params=params, batch_stats=stats)
        else:
            state, _, _ = restore_train_state(state, payload)

    train_loader, (train_dataset, _) = build_data_loader(
        "train", cfg, triplets=False, req_train_shuffle=False,
        drop_last=False)
    # --crop center: one center clip per test video; avg (default): mean
    # over sliding windows (reference evaluate.py:89-143)
    test_loader, (test_dataset, _) = build_data_loader(
        "test", cfg, triplets=False, drop_last=False, batch_size=1,
        test_windows=args.crop != "center")

    if args.heatmap:
        from video_similarity_search_tpu.evaluation import temporal_heat_map

        ex_idx, test_idx = (int(v) for v in args.heatmap.split(","))
        out_png = os.path.join(cfg.OUTPUT_PATH, "temporal_heat_map.png")
        temporal_heat_map(state, model, cfg, test_dataset,
                          exemplar_idx=ex_idx, test_idx=test_idx,
                          out_png=out_png)
        print(f"wrote {out_png}")

    topk = k_nearest_embeddings(state, model, cfg, train_loader, test_loader,
                                cache_dir=cfg.OUTPUT_PATH)

    if args.plot:
        from video_similarity_search_tpu.evaluation.embed import \
            load_cached_embeddings
        from video_similarity_search_tpu.evaluation.knn import \
            plot_exemplar_retrievals

        test_emb, _, _ = load_cached_embeddings(
            os.path.join(cfg.OUTPUT_PATH, "test_embeddings.pkl"))
        train_emb, _, _ = load_cached_embeddings(
            os.path.join(cfg.OUTPUT_PATH, "train_embeddings.pkl"))
        png = plot_exemplar_retrievals(
            test_emb, train_emb, test_dataset.samples,
            train_dataset.samples,
            os.path.join(cfg.OUTPUT_PATH, "exemplar_retrievals.png"))
        print(f"wrote {png}")

    print(f"total runtime: {time.time() - start:.1f}s")
    return topk


if __name__ == "__main__":
    main()
