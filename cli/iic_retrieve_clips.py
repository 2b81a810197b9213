#!/usr/bin/env python
"""IIC-protocol retrieval (reference iic_retrieve_clips.py:334-354).

Extract 10 evenly-spaced clip features per video for train and test
splits (cached as .npy), then cosine top-k retrieval (k in {1,5,10,20,50})
written to topk_correct.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from video_similarity_search_tpu.utils.compile_cache import \
    enable_compile_cache

enable_compile_cache()


def extract_features(model, state, cfg, dataset, feature_dir, split):
    import jax.numpy as jnp
    import numpy as np

    from video_similarity_search_tpu.data.augment import normalize_only
    from video_similarity_search_tpu.train import make_embed_step

    feat_path = os.path.join(feature_dir, f"{split}_features.npy")
    cls_path = os.path.join(feature_dir, f"{split}_classes.npy")
    if os.path.exists(feat_path):
        return np.load(feat_path), np.load(cls_path)

    embed = make_embed_step(cfg, model)
    feats, classes = [], []
    for i in range(len(dataset)):
        item = dataset[i]
        clips = jnp.asarray(item["clips"])  # (10, T, H, W, 3)
        x = normalize_only(clips, dataset=cfg.TRAIN.DATASET)
        emb = np.asarray(embed(state.params, state.batch_stats, x))
        feats.append(emb)  # (10, D)
        classes.append(item["label"])
        if (i + 1) % 50 == 0:
            print(f"[{split}] {i + 1}/{len(dataset)}")
    feats = np.stack(feats)
    classes = np.asarray(classes)
    os.makedirs(feature_dir, exist_ok=True)
    np.save(feat_path, feats)
    np.save(cls_path, classes)
    return feats, classes


def main():
    parser = argparse.ArgumentParser("iic_retrieve_clips")
    parser.add_argument("--cfg", dest="cfg_file", required=True)
    parser.add_argument("--checkpoint_path", default=None)
    # explicit-list mode (any dataset)
    parser.add_argument("--video_dir", default=None)
    parser.add_argument("--train_list", default=None)
    parser.add_argument("--test_list", default=None)
    parser.add_argument("--class_index", default=None)
    # layout mode (reference directory conventions): --dataset + --root_dir
    parser.add_argument("--dataset", default=None,
                        choices=[None, "ucf101", "hmdb51"],
                        help="use the reference split layout under "
                             "--root_dir (ucf101: split/+videos/; hmdb51: "
                             "prev_split/+avi/, iic_datasets/hmdb51.py:41-50)")
    parser.add_argument("--root_dir", default=None)
    parser.add_argument("--which_split", default="1")
    parser.add_argument("--feature_dir", default="features")
    parser.add_argument("--clip_len", type=int, default=16)
    parser.add_argument("--sample_num", type=int, default=10)
    args = parser.parse_args()
    if not args.dataset and not (args.video_dir and args.train_list
                                 and args.test_list and args.class_index):
        parser.error("pass either --dataset+--root_dir or the explicit "
                     "--video_dir/--train_list/--test_list/--class_index")

    import jax
    import jax.numpy as jnp

    from video_similarity_search_tpu.config import get_cfg
    from video_similarity_search_tpu.data.iic_data import (
        ClipRetrievalDataset, UCF101ClipRetrievalDataset, parse_split_file)
    from video_similarity_search_tpu.evaluation import iic_retrieval_acc
    from video_similarity_search_tpu.models import model_selector
    from video_similarity_search_tpu.train import (create_train_state,
                                                   load_checkpoint,
                                                   merge_pretrained,
                                                   restore_train_state,
                                                   torch_resnet3d_to_flax)

    cfg = get_cfg()
    cfg.merge_from_file(args.cfg_file)
    model = model_selector(cfg)
    sample = jnp.zeros((1, args.clip_len, cfg.DATA.SAMPLE_SIZE,
                        cfg.DATA.SAMPLE_SIZE, 3))
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

    if args.dataset:
        mk_split = lambda train: UCF101ClipRetrievalDataset(
            args.root_dir, args.clip_len, sample_num=args.sample_num,
            train=train, split=args.which_split,
            sample_size=cfg.DATA.SAMPLE_SIZE, layout=args.dataset)
        train_ds, test_ds = mk_split(True), mk_split(False)
    else:
        mk = lambda lst: ClipRetrievalDataset(
            args.video_dir, parse_split_file(lst, args.class_index),
            clip_len=args.clip_len, sample_num=args.sample_num,
            sample_size=cfg.DATA.SAMPLE_SIZE)
        train_ds, test_ds = mk(args.train_list), mk(args.test_list)
    train_feats, train_cls = extract_features(
        model, state, cfg, train_ds, args.feature_dir, "train")
    test_feats, test_cls = extract_features(
        model, state, cfg, test_ds, args.feature_dir, "test")

    topk = iic_retrieval_acc(test_feats, test_cls, train_feats, train_cls)
    out = {str(k): v for k, v in topk.items()}
    with open(os.path.join(args.feature_dir, "topk_correct.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
