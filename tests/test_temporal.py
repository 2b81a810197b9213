"""Property tests for the temporal index samplers (data/temporal.py —
reference datasets/temporal_transforms.py). These feed every dataset
class, so an out-of-range or wrong-length index list corrupts decode
silently; the invariants below hold for ANY video length and rate."""

import numpy as np
from hypothesis import given, settings, strategies as st

from video_similarity_search_tpu.data.temporal import (
    LoopPadding, Shuffle, SlidingWindow, TemporalBeginCrop,
    TemporalCenterCrop, TemporalEndCrop, TemporalEvenCrop,
    TemporalRandomCrop, TemporalRandomCrop2xSpeed, TemporalSubsampling,
    temporal_ds_frame_indices)

lengths = st.integers(min_value=1, max_value=120)
sizes = st.integers(min_value=1, max_value=32)
seeds = st.integers(0, 2 ** 31)


def _frames(n):
    # the datasets produce 1-based frame index lists
    return list(range(1, n + 1))


@settings(max_examples=60, deadline=None)
@given(lengths, sizes)
def test_fixed_crops_length_and_membership(n, size):
    frames = _frames(n)
    # LoopPadding pads up but never truncates (reference
    # temporal_transforms.py LoopPadding semantics)
    padded = LoopPadding(size)(frames)
    assert len(padded) == max(n, size)
    assert set(padded) <= set(frames)
    for t in (TemporalBeginCrop(size), TemporalEndCrop(size),
              TemporalCenterCrop(size)):
        out = t(frames)
        assert len(out) == size, type(t).__name__
        assert set(out) <= set(frames), type(t).__name__
    # begin crop starts at the first frame; end crop ends at the last
    assert TemporalBeginCrop(size)(frames)[0] == frames[0]
    assert TemporalEndCrop(size)(frames)[min(size, n) - 1] == frames[-1]


@settings(max_examples=60, deadline=None)
@given(lengths, sizes, st.integers(min_value=0, max_value=40), seeds)
def test_random_crop_contiguous_window(n, size, start_index, seed):
    frames = _frames(n)
    t = TemporalRandomCrop(size, start_index=start_index)
    t.rng = np.random.default_rng(seed)
    out = t(frames)
    # contiguous in-range window of at most `size` frames (the reference
    # does NOT loop-pad here; short videos yield short windows)
    assert 1 <= len(out) <= size
    assert out == list(range(out[0], out[0] + len(out)))
    assert set(out) <= set(frames)
    if n >= size + start_index:
        # start_index is the earliest allowed begin when it fits
        assert out[0] >= frames[0] + min(start_index, n - size) - 0
        assert len(out) == size


@settings(max_examples=60, deadline=None)
@given(lengths, sizes, seeds)
def test_random_crop_2x_speed_is_stride2(n, size, seed):
    frames = _frames(n)
    t = TemporalRandomCrop2xSpeed(size)
    t.rng = np.random.default_rng(seed)
    out = t(frames)
    assert 1 <= len(out) <= size
    assert set(out) <= set(frames)
    # consecutive sampled frames are exactly 2 apart (2x playback)
    assert all(b - a == 2 for a, b in zip(out, out[1:]))


@settings(max_examples=60, deadline=None)
@given(lengths, sizes, st.integers(min_value=1, max_value=6))
def test_even_crop_windows(n, size, n_samples):
    frames = _frames(n)
    out = TemporalEvenCrop(size, n_samples)(frames)
    assert 1 <= len(out) <= n_samples
    for w in out:
        assert len(w) == size
        assert set(w) <= set(frames)


@settings(max_examples=60, deadline=None)
@given(lengths, sizes, st.integers(min_value=0, max_value=32))
def test_sliding_window_covers_video(n, size, stride):
    frames = _frames(n)
    out = SlidingWindow(size, stride)(frames)
    assert out, "at least one window"
    for w in out:
        assert len(w) == size
        assert set(w) <= set(frames)
    # every frame of the video appears in some window when the stride
    # does not exceed the window size (the non-overlap test protocol)
    if (stride or size) <= size:
        covered = set()
        for w in out:
            covered |= set(w)
        assert covered == set(frames)


@settings(max_examples=60, deadline=None)
@given(lengths, st.integers(min_value=1, max_value=5), seeds)
def test_shuffle_is_block_permutation(n, block, seed):
    frames = _frames(n)
    t = Shuffle(block_size=block)
    t.rng = np.random.default_rng(seed)
    out = t(frames)
    # a permutation of the frames that keeps each block contiguous
    assert sorted(out) == frames
    blocks = [tuple(frames[i:i + block]) for i in range(0, n, block)]
    out_blocks = set()
    i = 0
    while i < len(out):
        width = len(blocks[0]) if len(out) - i >= block else len(out) - i
        # find the matching source block width (tail block may be short)
        for b in blocks:
            if tuple(out[i:i + len(b)]) == b:
                out_blocks.add(b)
                i += len(b)
                break
        else:
            raise AssertionError(f"non-block run at {i}: {out}")
    assert out_blocks == set(blocks)


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=16),
       st.integers(min_value=1, max_value=200),
       st.integers(min_value=0, max_value=199),
       st.integers(min_value=1, max_value=4))
def test_temporal_ds_indices_in_range(duration, total, start, ds):
    out = temporal_ds_frame_indices(duration, total, start, ds)
    assert len(out) == duration
    assert all(1 <= i <= total for i in out)  # 1-based, wraps


@settings(max_examples=40, deadline=None)
@given(lengths, st.integers(min_value=1, max_value=8))
def test_subsampling_stride(n, stride):
    frames = _frames(n)
    out = TemporalSubsampling(stride)(frames)
    assert out == frames[::stride]
