"""Loader builder + double-buffered host->device feeding.

Reference ``build_data_loader`` (datasets/data_loader.py:205-342) returns a
torch DataLoader with DistributedSampler. Here:

  * the dataset objects produce numpy uint8 clips (datasets.py);
  * a thread-pool prefetcher (IO-bound JPEG decode releases the GIL)
    assembles batches ahead of consumption (``TPU.PREFETCH_DEPTH``);
  * per-host sharding replaces DistributedSampler: each process iterates
    its contiguous slice of the (epoch-reshuffled) index permutation;
  * ragged final batches are PADDED to the static batch size (repeating
    the last item) with ``__size__`` = real item count and ``__valid__`` a
    boolean item mask, instead of the reference's drop_last workaround for
    its all_gather bug (datasets/data_loader.py:317-322; SURVEY §7.4).
    Every batch of an epoch therefore has the same shape: one jit trace,
    no retraces on the ragged tail. Consumers slice ``[:__size__]`` (or
    clip-level ``sum(window_counts[:__size__])`` for flattened multi-window
    batches) on host. Train triplet loaders still drop_last like the
    reference;
  * per-GPU batch = BATCH_SIZE / world and 6x for non-triplet eval loaders
    (reference :300-313) is preserved as global BATCH_SIZE (and 6x eval).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import numpy as np

from .datasets import ClipReader, TripletsDataset, VideoDataset
from .loaders import BinaryImageLoaderPIL, VideoLoader
from .manifests import (get_manifest, kp_img_name_formatter,
                        optical_img_name_formatter,
                        salient_img_name_formatter)
from .temporal import (Compose as TemporalCompose, TemporalBeginCrop,
                       TemporalCenterCrop, TemporalRandomCrop,
                       TemporalRandomCrop2xSpeed)


def get_channel_extension(cfg) -> Dict[str, Tuple[str, object]]:
    """name -> (root path, loader) (reference datasets/data_loader.py:174-201)."""
    ext: Dict[str, Tuple[str, object]] = {}
    for name in str(cfg.DATASET.CHANNEL_EXTENSIONS).split(","):
        name = name.strip()
        if name == "keypoint":
            ext[name] = (cfg.DATASET.KEYPOINT_PATH,
                         VideoLoader(kp_img_name_formatter,
                                     BinaryImageLoaderPIL))
        elif name == "salient":
            ext[name] = (cfg.DATASET.SALIENT_PATH,
                         VideoLoader(salient_img_name_formatter,
                                     BinaryImageLoaderPIL))
        elif name == "optical_u":
            ext[name] = (cfg.DATASET.OPTICAL_U_PATH,
                         VideoLoader(optical_img_name_formatter,
                                     BinaryImageLoaderPIL))
        elif name == "optical_v":
            ext[name] = (cfg.DATASET.OPTICAL_V_PATH,
                         VideoLoader(optical_img_name_formatter,
                                     BinaryImageLoaderPIL))
    return ext


def build_temporal_transforms(cfg, triplets: bool = True):
    """reference build_temporal_transformation (data_loader.py:124-169)."""
    d = cfg.DATA.SAMPLE_DURATION
    if triplets:
        tt = {
            "anchor": TemporalCompose([TemporalBeginCrop(d)]),
            "positive": TemporalCompose(
                [TemporalRandomCrop(d, start_index=d)]),
            "negative": TemporalCompose([TemporalRandomCrop(d)]),
        }
        if cfg.LOSS.RELATIVE_SPEED_PERCEPTION:
            tt["fast_positive"] = TemporalCompose(
                [TemporalRandomCrop2xSpeed(d, start_index=d)])
        if cfg.LOSS.INTRA_NEGATIVE:
            tt["intra_negative"] = TemporalCompose([TemporalRandomCrop(d)])
        return tt
    if cfg.DATA.TEMPORAL_CROP == "random":
        return TemporalCompose([TemporalRandomCrop(d)])
    return TemporalCompose([TemporalCenterCrop(d)])


class _ProducerError:
    """Exception relay from the prefetch thread to the consuming iterator."""

    def __init__(self, exc: BaseException):
        self.exc = exc


_TOUCH_JIT = None


def _touch_jit():
    """One shared jitted reduce used to force device uploads (cached so
    per-batch calls reuse one trace per shape set instead of building a
    fresh jit wrapper every batch)."""
    global _TOUCH_JIT
    if _TOUCH_JIT is None:
        import jax
        import jax.numpy as jnp

        _TOUCH_JIT = jax.jit(
            lambda xs: sum(x.ravel()[0].astype(jnp.float32) for x in xs))
    return _TOUCH_JIT


class PrefetchLoader:
    """Batched, shuffled, thread-prefetched iterator over a dataset.

    ``device_upload=True`` additionally moves each batch's large array
    leaves to the device INSIDE the producer thread (``jax.device_put`` +
    a forced materialization), so the host->HBM transfer overlaps the next
    batch's decode instead of serializing inside the consumer's first
    jitted execute — the torch pin_memory/worker overlap the reference
    gets for free (datasets/data_loader.py:300-342). Single-process only
    (multi-host assembly needs host numpy for
    ``make_array_from_process_local_data``)."""

    def __init__(self, dataset, batch_size: int, *, shuffle: bool,
                 drop_last: bool, collate: Callable, num_workers: int = 4,
                 prefetch_depth: int = 2, seed: int = 0,
                 shard_index: int = 0, num_shards: int = 1,
                 device_upload: bool = False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate = collate
        self.num_workers = max(1, num_workers)
        self.prefetch_depth = prefetch_depth
        self.seed = seed
        self.epoch = 0
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.device_upload = device_upload
        # optional NamedSharding for uploads: on a multi-chip mesh the
        # producer should shard the batch directly instead of staging
        # whole global batches on device 0 (the consumer would otherwise
        # reshard through a chip-0 hop and pin its HBM); set by the
        # driver after construction when a mesh exists
        self.upload_sharding = None
        # gradient accumulation (TRAIN.ACCUM_STEPS): reshape uploaded big
        # leaves (B, ...) -> (A, B/A, ...) in the producer so the consumer
        # never reshapes a sharded array in-jit (driver sets this together
        # with a microbatch upload_sharding)
        self.upload_microbatch = 1
        self._upload_shape_sig = None
        self._atexit_registered = False
        # current producer (stop event, thread) for the single exit hook
        self._live: Optional[Tuple] = None

    # large array leaves are worth an early upload; small metadata stays host
    _UPLOAD_MIN_BYTES = 1 << 16

    def _upload(self, batch):
        """Producer-side device_put + forced transfer of the big leaves.

        A plain ``device_put`` can be lazy (notably over the axon remote
        tunnel, where the actual upload otherwise happens inside the FIRST
        executable that consumes the buffer at ~35 MB/s on the execute
        path); touching every uploaded buffer with one trivial jitted
        reduce and materializing the scalar forces the transfer to finish
        here, in the prefetch thread, overlapped with decode.

        Shape-stability gate: the touch program (and any consumer jit)
        specializes on shapes, and multi-window eval batches flatten a
        VARIABLE clip count — uploading those would compile a fresh
        program per batch and serialize uploads behind compiles. Upload
        only when the big-leaf shape signature repeats (train loaders:
        always after the first batch; unstable eval loaders fall back to
        host batches)."""
        import jax

        big = {k: v for k, v in batch.items()
               if isinstance(v, np.ndarray)
               and v.nbytes >= self._UPLOAD_MIN_BYTES}
        sig = tuple(sorted((k, v.shape) for k, v in big.items()))
        stable = sig == self._upload_shape_sig
        self._upload_shape_sig = sig
        if not big or not stable:
            return batch

        out = dict(batch)
        touched = []
        accum = max(1, int(self.upload_microbatch))
        for k, v in big.items():
            if accum > 1:
                if v.ndim < 4:
                    # Non-clip leaves (e.g. the triplet 'targets' (2B,)
                    # vector, interleaved [anchors; positives]) need the
                    # consumer's per-microbatch interleaved layout
                    # (driver._microbatch_leaf), not this contiguous
                    # reshape — leave them on host.
                    continue
                if v.shape[0] % accum != 0:
                    continue  # stays host; the consumer reshapes it
                v = v.reshape((accum, v.shape[0] // accum) + v.shape[1:])
            sh = self.upload_sharding
            sharded_dim = 1 if accum > 1 else 0
            if sh is not None and v.shape[sharded_dim] % max(
                    1, getattr(sh, "num_devices", 1)) != 0:
                sh = None  # non-divisible leaf: single-device fallback
            dv = jax.device_put(v, sh) if sh is not None \
                else jax.device_put(v)
            out[k] = dv
            touched.append(dv)
        if touched:
            # materialize: upload is complete past this point
            float(_touch_jit()(touched))
        return out

    def set_epoch(self, epoch: int) -> None:
        """reference DistributedSampler.set_epoch (online_train.py:672-673)."""
        self.epoch = epoch
        if hasattr(self.dataset, "set_epoch_seed"):
            self.dataset.set_epoch_seed(self.seed + epoch)

    def _indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + self.epoch).permutation(n)
        if self.num_shards > 1:
            # Pad the global permutation (wrapping from the front) so every
            # host's shard has EQUAL length — otherwise per-host batch counts
            # can differ by one and the host with the extra step deadlocks in
            # its jitted collectives. Same semantics as the reference's
            # torch DistributedSampler (datasets/data_loader.py:283).
            total = ((n + self.num_shards - 1)
                     // self.num_shards) * self.num_shards
            if total > n:
                idx = np.concatenate([idx, idx[:total - n]])
            idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self) -> int:
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator:
        idx = self._indices()
        batches: List[np.ndarray] = []
        end = (len(idx) // self.batch_size * self.batch_size
               if self.drop_last else len(idx))
        for s in range(0, end, self.batch_size):
            batches.append(idx[s:s + self.batch_size])
        if not batches:
            return iter(())

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            # bounded put that aborts when the consumer abandoned the
            # iterator: a daemon thread blocked forever in out_q.put would
            # be killed at interpreter exit — fatal if it then sits inside
            # an XLA call (device_upload)
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # a producer exception must NOT look like a normal end of
            # epoch (a single corrupt JPEG would silently truncate the
            # epoch — and desynchronize per-host step counts into a
            # collective deadlock under num_shards > 1); ship it to the
            # consumer and re-raise there
            try:
                for bidx in batches:
                    if stop.is_set():
                        break
                    items = list(pool.map(self.dataset.__getitem__, bidx))
                    real = len(items)
                    if real < self.batch_size:
                        # pad+mask the ragged tail to the static batch size
                        items = items + [items[-1]] * (self.batch_size - real)
                    batch = self.collate(items)
                    if batch is not None:
                        batch["__valid__"] = (np.arange(self.batch_size)
                                              < real)
                        batch["__size__"] = real
                        if self.device_upload:
                            batch = self._upload(batch)
                    if not put_or_stop(batch):
                        break
            except BaseException as e:  # noqa: BLE001 - relayed, not dropped
                put_or_stop(_ProducerError(e))
            finally:
                put_or_stop(None)

        thread = threading.Thread(target=produce, daemon=True)
        thread.start()
        # Interpreter-exit safety: a daemon producer killed while inside an
        # XLA call (device_upload) aborts the process with a C++ terminate.
        # threading's internal atexit hooks run BEFORE non-daemon joins /
        # runtime teardown, so stop the producer and give it a moment to
        # leave any in-flight upload. ONE callback per loader (tracking
        # the CURRENT producer) — registering per-__iter__ would
        # accumulate a callback per epoch for the process lifetime.
        self._live = (stop, thread)
        if not self._atexit_registered:
            def _drain():
                live = self._live
                if live is not None:
                    live[0].set()
                    live[1].join(timeout=5)

            try:
                threading._register_atexit(_drain)
                self._atexit_registered = True
            except Exception:  # registration after shutdown began / no API
                pass

        def gen():
            try:
                while True:
                    batch = out_q.get()
                    if batch is None:
                        break
                    if isinstance(batch, _ProducerError):
                        raise RuntimeError(
                            "PrefetchLoader producer failed"
                        ) from batch.exc
                    yield batch
            finally:
                stop.set()
                pool.shutdown(wait=False)

        return gen()


def collate_triplets(items: List[dict]) -> dict:
    out = {
        "anchor": np.stack([it["anchor"] for it in items]),
        "positive": np.stack([it["positive"] for it in items]),
        "index": np.array([it["index"] for it in items], np.int32),
    }
    a_t = np.array([it["targets"][0] for it in items], np.int32)
    p_t = np.array([it["targets"][1] for it in items], np.int32)
    out["targets"] = np.concatenate([a_t, p_t])  # (2B,) like the trainer
    if "extra" in items[0]:
        out["extra"] = np.stack([it["extra"] for it in items])
    if "negative" in items[0]:
        out["negative"] = np.stack([it["negative"] for it in items])
        out["n_target"] = np.array([it["n_target"] for it in items], np.int32)
    if "ds_label" in items[0]:
        out["ds_label"] = np.array([it["ds_label"] for it in items], np.int32)
    return out


def collate_videos(items: List[dict]) -> dict:
    """Flattens multi-window test items (reference datasets/dataset.py:19-31)."""
    clips, targets, indices, window_counts = [], [], [], []
    for it in items:
        clip = it["clip"]
        if clip.ndim == 5:  # (windows, T, H, W, C)
            for w in range(clip.shape[0]):
                clips.append(clip[w])
                targets.append(it["target"])
                indices.append(it["index"])
            window_counts.append(clip.shape[0])
        else:
            clips.append(clip)
            targets.append(it["target"])
            indices.append(it["index"])
            window_counts.append(1)
    return {
        "clip": np.stack(clips),
        "target": np.array(targets, np.int32),
        "index": np.array(indices, np.int32),
        "window_counts": np.array(window_counts, np.int32),
    }


def build_data_loader(split: str, cfg, is_master_proc: bool = True,
                      triplets: bool = True, negative_sampling: bool = False,
                      req_train_shuffle: Optional[bool] = None,
                      drop_last: Optional[bool] = None,
                      batch_size: Optional[int] = None,
                      val_sample: Optional[int] = 1,
                      shard_index: int = 0, num_shards: int = 1,
                      buffer_size: Optional[int] = None,
                      test_windows: bool = True,
                      cluster_labels=None):
    """Same role/signature as reference build_data_loader
    (datasets/data_loader.py:205-342). Returns (loader, (dataset, None)).

    ``cluster_labels``: in-memory pseudo-labels (dataset order) that
    override the CLUSTER_PATH file read — the multi-host rebuild path
    (every host computes identical labels; only the master writes the
    file)."""
    dataset_name = cfg.TRAIN.DATASET
    # channel extensions only where the reference attaches them
    # (data_loader.py:230-233): with POS_CHANNEL_REPLACE the extra views
    # exist solely so the TRAIN triplet loader can replace positives —
    # eval/val loaders stay 3-channel RGB; without replacement the
    # extensions concat into the input channels everywhere.
    use_ext = ((triplets and cfg.DATASET.POS_CHANNEL_REPLACE
                and split == "train")
               or not cfg.DATASET.POS_CHANNEL_REPLACE)
    channel_ext = get_channel_extension(cfg) if use_ext else {}
    if channel_ext and not cfg.DATASET.POS_CHANNEL_REPLACE \
            and not cfg.DATASET.MODALITY:
        assert len(channel_ext) + 3 == cfg.DATA.INPUT_CHANNEL_NUM, (
            f"CHANNEL_EXTENSIONS adds {len(channel_ext)} channels but "
            f"INPUT_CHANNEL_NUM={cfg.DATA.INPUT_CHANNEL_NUM} "
            "(reference datasets/data_loader.py:233)")
    cluster_path = cfg.DATASET.CLUSTER_PATH or None

    manifest_kwargs = dict(
        annotation_path=cfg.DATASET.ANNOTATION_PATH,
        root_path=cfg.DATASET.VID_PATH,
        split=split,
        sample_duration=cfg.DATA.SAMPLE_DURATION,
        cluster_path=cluster_path if split == "train" else None,
        cluster_labels=cluster_labels if split == "train" else None,
        verbose=is_master_proc,
    )
    if dataset_name != "kinetics":
        manifest_kwargs["channel_ext"] = {k: v[0]
                                          for k, v in channel_ext.items()}
        manifest_kwargs["val_sample"] = val_sample
    samples, idx_to_class = get_manifest(dataset_name, **manifest_kwargs)

    target_type = (cfg.DATASET.TARGET_TYPE_T if split == "train"
                   else cfg.DATASET.TARGET_TYPE_V)
    if target_type == "cluster_label" and (
            not samples or "cluster_label" not in samples[0]):
        target_type = "label"  # warmup epochs before the first clustering

    sample_size = cfg.DATA.SAMPLE_SIZE
    train_aug = split == "train" and triplets
    # ``buffer_size`` override: ten-crop testing needs a decode buffer
    # larger than the crop so the five crop positions differ (reference
    # scales to 1.14x then crops, coclr_classify.py:528-534)
    reader = ClipReader(
        channel_ext,
        buffer_size=buffer_size or (2 * sample_size if train_aug
                                    else sample_size),
        eval_mode=not train_aug,
        prob_pos_channel_replace=cfg.DATASET.PROB_POS_CHANNEL_REPLACE,
        rrc_size=sample_size if (train_aug and cfg.TPU.HOST_RRC) else None,
    )

    if triplets:
        dataset = TripletsDataset(
            samples,
            temporal_transforms=build_temporal_transforms(cfg, True),
            reader=reader,
            target_type=target_type,
            positive_sampling_p=cfg.DATASET.POSITIVE_SAMPLING_P,
            negative_sampling=negative_sampling,
            pos_channel_replace=(cfg.DATASET.POS_CHANNEL_REPLACE
                                 and split == "train"),
            relative_speed_perception=cfg.LOSS.RELATIVE_SPEED_PERCEPTION,
            local_local_contrast=cfg.LOSS.LOCAL_LOCAL_CONTRAST,
            intra_negative=cfg.LOSS.INTRA_NEGATIVE,
            predict_temporal_ds=cfg.MODEL.PREDICT_TEMPORAL_DS,
            sample_duration=cfg.DATA.SAMPLE_DURATION,
            split=split,
        )
        collate = collate_triplets
        bsz = batch_size or (cfg.TRAIN.BATCH_SIZE if split == "train"
                             else cfg.VAL.BATCH_SIZE)
        shuffle = split == "train" if req_train_shuffle is None \
            else req_train_shuffle
        # static train batches; val keeps its ragged last batch (we pad+mask
        # instead of the reference's drop_last bug workaround, SURVEY §7.4)
        dl = drop_last if drop_last is not None else (split == "train")
    else:
        # test_windows=False: --crop center, one center clip per test video
        # instead of averaged sliding windows (reference evaluate.py:89-143)
        ds_split = split if (split != "test" or test_windows) else "val"
        dataset = VideoDataset(
            samples,
            temporal_transform=build_temporal_transforms(cfg, False),
            reader=reader,
            target_type=target_type,
            split=ds_split,
            sample_duration=cfg.DATA.SAMPLE_DURATION,
        )
        collate = collate_videos
        # 6x eval batch (reference datasets/data_loader.py:300-313),
        # raised to the v5e conv packing plateau (>=256 clips/step, PERF.md
        # round-3 sweep: +35% embed throughput) when the dataset is big
        # enough to fill it — batch size doesn't change eval results
        default_bsz = (cfg.TRAIN.BATCH_SIZE if split == "train"
                       else cfg.VAL.BATCH_SIZE)
        if cfg.TRAIN.EVAL_BATCH_SIZE:
            bsz = batch_size or cfg.TRAIN.EVAL_BATCH_SIZE
        else:
            bsz = batch_size or min(max(default_bsz * 6, 256),
                                    max(len(samples), default_bsz * 6))
            # the auto batch can land on len(samples) (any value between
            # default*6 and 256) — round down to a device-count multiple
            # so the sharded embedding pass divides evenly
            try:
                import jax
                n_dev = jax.device_count()
            except Exception:  # pragma: no cover - jax init failure
                n_dev = 1
            if bsz > n_dev:
                bsz -= bsz % n_dev
        shuffle = False if req_train_shuffle is None else req_train_shuffle
        dl = drop_last if drop_last is not None else False

    if cfg.TPU.PREFETCH_DEVICE_PUT:
        try:
            import jax
            upload = jax.process_count() == 1
        except Exception:  # pragma: no cover - jax init failure
            upload = False
    else:
        upload = False
    loader = PrefetchLoader(
        dataset, bsz, shuffle=shuffle, drop_last=dl, collate=collate,
        num_workers=cfg.TRAIN.NUM_DATA_WORKERS,
        prefetch_depth=cfg.TPU.PREFETCH_DEPTH,
        shard_index=shard_index, num_shards=num_shards,
        device_upload=upload,
    )
    return loader, (dataset, idx_to_class)
