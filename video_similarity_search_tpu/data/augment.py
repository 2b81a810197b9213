"""Fused on-device clip augmentation.

The reference applies per-frame PIL/cv2 transforms on dataloader workers
(datasets/spatial_transforms.py:13-325) with one ``randomize_parameters()``
draw per clip. Here the whole chain — RandomResizedCrop, horizontal flip,
ColorJitter(p=0.8, random op order), ColorDrop(grayscale p=0.2),
GaussianBlur(15x15, sigma=2, p=0.2), normalize — is ONE jitted function on
uint8 clip batches: geometry via ``jax.image.scale_and_translate`` (crop +
resize in one pass, static output shape), color ops as fused elementwise
math, blur as a separable depthwise conv. Clip-consistency = one parameter
draw per clip broadcast over frames (vmap over the batch axis).

Host-side protocol: the loader decodes frames and resizes them to a fixed
``pre_size`` square buffer (default 2x the crop size so the smallest
reference crop — 0.25 area — needs no upsampling); crop boxes are sampled
in that buffer's coordinates. The reference samples boxes in original-image
coordinates — at UCF/Kinetics frame sizes the induced distribution is very
close; documented divergence for the fixed-aspect buffer.

Eval path (Resize(short-edge) + CenterCrop + ToTensor + ScaleValue,
reference datasets/data_loader.py:107-115) happens on host in
``pipeline.py`` since it is cheap and shape-changing; the device then only
normalizes.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

# reference datasets/data_loader.py:53-66
MEAN_STD = {
    "kinetics": ((0.4345, 0.4051, 0.3775), (0.2768, 0.2713, 0.2737)),
    "imagenet": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
}
# reference datasets/data_loader.py:29-30
TRAIN_CROP_MIN_SCALE = 0.25
TRAIN_CROP_MIN_RATIO = 0.75

_GRAY = jnp.array([0.299, 0.587, 0.114])  # PIL 'L' weights


def normalization_constants(dataset: str, num_channels: int = 3):
    """Mean/std vectors; extension channels get mean 0 / std 1
    (reference get_normalize_method, datasets/data_loader.py:69-83)."""
    mean, std = MEAN_STD["kinetics" if dataset == "kinetics" else "imagenet"]
    extra = num_channels - 3
    mean = tuple(mean) + (0.0,) * extra
    std = tuple(std) + (1.0,) * extra
    return jnp.array(mean), jnp.array(std)


def _sample_crop(key, h: int, w: int, scale, ratio):
    """torchvision RandomResizedCrop.get_params, vectorized 10 attempts +
    center fallback. Returns (top, left, height, width) floats."""
    k1, k2, k3 = jax.random.split(key, 3)
    area = h * w
    target_area = area * jax.random.uniform(k1, (10,), minval=scale[0],
                                            maxval=scale[1])
    log_ratio = jax.random.uniform(k2, (10,), minval=jnp.log(ratio[0]),
                                   maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    ws = jnp.sqrt(target_area * aspect)
    hs = jnp.sqrt(target_area / aspect)
    valid = (ws <= w) & (hs <= h)
    pick = jnp.argmax(valid)  # first valid attempt
    any_valid = jnp.any(valid)
    cw = jnp.where(any_valid, ws[pick], jnp.float32(w))
    ch = jnp.where(any_valid, hs[pick], jnp.float32(h))
    # random placement
    u1, u2 = jax.random.uniform(k3, (2,))
    top = u1 * (h - ch)
    left = u2 * (w - cw)
    # fallback = full-frame center crop clamped to ratio (close to torchvision)
    return top, left, ch, cw


def _resized_crop(frames: Array, top, left, ch, cw, out_size: int) -> Array:
    """(T, H, W, C) float -> (T, S, S, C) bilinear, crop+resize in one pass."""
    scale_y = out_size / ch
    scale_x = out_size / cw
    return jax.image.scale_and_translate(
        frames,
        (frames.shape[0], out_size, out_size, frames.shape[-1]),
        (1, 2),
        jnp.stack([scale_y, scale_x]),
        jnp.stack([-top * scale_y, -left * scale_x]),
        method="bilinear",
    )


def _rgb_to_hsv(rgb: Array):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-8), 0.0)
    safe = jnp.maximum(delta, 1e-8)
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(r == maxc, bc - gc,
                  jnp.where(g == maxc, 2.0 + rc - bc, 4.0 + gc - rc))
    h = (h / 6.0) % 1.0
    h = jnp.where(delta == 0, 0.0, h)
    return h, s, v


def _hsv_to_rgb(h: Array, s: Array, v: Array) -> Array:
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    conds = [(v, t, p), (q, v, p), (p, v, t), (p, q, v), (t, p, v), (v, p, q)]
    r = jnp.select([i == k for k in range(6)], [c[0] for c in conds])
    g = jnp.select([i == k for k in range(6)], [c[1] for c in conds])
    b = jnp.select([i == k for k in range(6)], [c[2] for c in conds])
    return jnp.stack([r, g, b], axis=-1)


def _jitter_clip(rgb: Array, perm, factors) -> Array:
    """Apply the 4 jitter ops in the sampled order (torchvision semantics)."""
    b_f, c_f, s_f, h_f = factors

    def brightness(x):
        return jnp.clip(x * b_f, 0.0, 1.0)

    def contrast(x):
        # torchvision: blend with mean of grayscale
        mean = jnp.mean(x @ _GRAY)
        return jnp.clip(mean + c_f * (x - mean), 0.0, 1.0)

    def saturation(x):
        gray = (x @ _GRAY)[..., None]
        return jnp.clip(gray + s_f * (x - gray), 0.0, 1.0)

    def hue(x):
        h, s, v = _rgb_to_hsv(x)
        return jnp.clip(_hsv_to_rgb((h + h_f) % 1.0, s, v), 0.0, 1.0)

    fns = [brightness, contrast, saturation, hue]
    for step in range(4):
        rgb = jax.lax.switch(perm[step], fns, rgb)
    return rgb


def _gaussian_kernel(size: int = 15, sigma: float = 2.0) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return k / jnp.sum(k)


def _blur_clip(frames: Array, size: int = 15, sigma: float = 2.0) -> Array:
    """Separable 15x15 sigma-2 blur (reference GaussianBlur,
    spatial_transforms.py:311-325 uses cv2.GaussianBlur((15,15),2))."""
    k = _gaussian_kernel(size, sigma)
    pad = size // 2
    # depthwise separable: conv over H then W (same weights all channels)
    x = jnp.moveaxis(frames, -1, 1)  # (T, C, H, W)
    t, c, h, w = x.shape
    x = x.reshape(t * c, 1, h, w)
    kh = k.reshape(1, 1, size, 1)
    kw = k.reshape(1, 1, 1, size)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1),
                                     [(pad, pad), (0, 0)])
    x = jax.lax.conv_general_dilated(x, kw, (1, 1),
                                     [(0, 0), (pad, pad)])
    return jnp.moveaxis(x.reshape(t, c, h, w), 1, -1)


def _augment_one(clip_u8: Array, key, out_size: int,
                 jitter_strength, hue_strength,
                 p_jitter: float, p_gray: float, p_blur: float,
                 pre_cropped: bool = False) -> Array:
    """(T, H, W, C) uint8 -> (T, S, S, C) float32 in [0, 1]-ish (pre-norm)."""
    keys = jax.random.split(key, 8)
    t, h, w, c = clip_u8.shape
    x = clip_u8.astype(jnp.float32) / 255.0

    if not pre_cropped:
        # RandomResizedCrop (scale 0.25-1.0, ratio 0.75-1.333,
        # data_loader.py:100-102)
        top, left, ch, cw = _sample_crop(
            keys[0], h, w, (TRAIN_CROP_MIN_SCALE, 1.0),
            (TRAIN_CROP_MIN_RATIO, 1.0 / TRAIN_CROP_MIN_RATIO))
        x = _resized_crop(x, top, left, ch, cw, out_size)

    # horizontal flip p=0.5
    do_flip = jax.random.bernoulli(keys[1])
    x = jnp.where(do_flip, x[:, :, ::-1, :], x)

    rgb, ext = x[..., :3], x[..., 3:]

    # ColorJitter(brightness/contrast/saturation=0.5, hue=0.5, p=0.8)
    s = jitter_strength
    b_f = jax.random.uniform(keys[2], (), minval=max(0.0, 1 - s), maxval=1 + s)
    c_f = jax.random.uniform(keys[3], (), minval=max(0.0, 1 - s), maxval=1 + s)
    s_f = jax.random.uniform(keys[4], (), minval=max(0.0, 1 - s), maxval=1 + s)
    h_f = jax.random.uniform(keys[5], (), minval=-hue_strength,
                             maxval=hue_strength)
    perm = jax.random.permutation(keys[6], 4)
    do_jit = jax.random.uniform(keys[7]) < p_jitter
    jittered = _jitter_clip(rgb, perm, (b_f, c_f, s_f, h_f))
    rgb = jnp.where(do_jit, jittered, rgb)

    # ColorDrop (grayscale, p=0.2)
    k_gray, k_blur = jax.random.split(jax.random.fold_in(key, 101))
    do_gray = jax.random.uniform(k_gray) < p_gray
    gray3 = jnp.repeat((rgb @ _GRAY)[..., None], 3, axis=-1)
    rgb = jnp.where(do_gray, gray3, rgb)

    x = jnp.concatenate([rgb, ext], axis=-1) if ext.shape[-1] else rgb

    # GaussianBlur p=0.2 (applied to all channels like the cv2 call)
    do_blur = jax.random.uniform(k_blur) < p_blur
    x = jnp.where(do_blur, _blur_clip(x), x)
    return x


@functools.partial(jax.jit, static_argnames=("out_size", "dataset",
                                             "pre_cropped"))
def train_augment(clips_u8: Array, key, out_size: int,
                  dataset: str = "ucf101",
                  pre_cropped: bool = False) -> Array:
    """(B, T, H, W, C) uint8 -> (B, T, S, S, C) normalized float32.

    One fused program: per-clip param draws, crop+resize, flip, jitter,
    gray, blur, normalize (the reference's train spatial_transform chain,
    datasets/data_loader.py:96-108). ``pre_cropped`` (TPU.HOST_RRC): the
    host already applied RandomResizedCrop inside the native decode, so
    the device chain skips its crop+resize (input is already S x S)."""
    b = clips_u8.shape[0]
    keys = jax.random.split(key, b)
    aug = jax.vmap(
        lambda clip, k: _augment_one(clip, k, out_size, 0.5, 0.5,
                                     0.8, 0.2, 0.2, pre_cropped=pre_cropped)
    )(clips_u8, keys)
    mean, std = normalization_constants(dataset, clips_u8.shape[-1])
    return (aug - mean) / std


@functools.partial(jax.jit, static_argnames=("dataset",))
def normalize_only(clips_u8: Array, dataset: str = "ucf101") -> Array:
    """Eval path: host already resized+center-cropped; scale+normalize."""
    x = clips_u8.astype(jnp.float32) / 255.0
    mean, std = normalization_constants(dataset, clips_u8.shape[-1])
    return (x - mean) / std


# ---------------------------------------------------------------------------
# CoCLR leaf transforms (reference coclr_utils/augmentation.py:16-230)
# ---------------------------------------------------------------------------

def pad_clip(clips: Array, pad: int) -> Array:
    """Padding (reference augmentation.py:16-21, ImageOps.expand border
    fill 0): zero-pad the spatial dims of (B, T, H, W, C) clips."""
    return jnp.pad(clips, ((0, 0), (0, 0), (pad, pad), (pad, pad), (0, 0)))


@functools.partial(jax.jit, static_argnames=("size", "method"))
def scale_clip(clips: Array, size, method: str = "cubic") -> Array:
    """Scale (reference augmentation.py:24-45): short-edge resize when
    ``size`` is an int (no-op if the short edge already matches), exact
    (h, w) otherwise. Bicubic like the reference's Image.BICUBIC."""
    b, t, h, w, c = clips.shape
    if isinstance(size, int):
        if (w <= h and w == size) or (h <= w and h == size):
            return clips
        if w < h:
            ow, oh = size, int(size * h / w)
        else:
            oh, ow = size, int(size * w / h)
    else:
        oh, ow = size
    dtype = clips.dtype
    out = jax.image.resize(clips.astype(jnp.float32), (b, t, oh, ow, c),
                           method=method)
    if jnp.issubdtype(dtype, jnp.integer):
        out = jnp.clip(jnp.round(out), 0, 255)
    return out.astype(dtype)


@functools.partial(jax.jit, static_argnames=("p", "consistent", "seq_len"))
def random_gray_clip(clips: Array, key, p: float = 0.5,
                     consistent: bool = True, seq_len: int = 0) -> Array:
    """RandomGray (reference augmentation.py:182-219): channel SPLITTING —
    one randomly chosen channel replicated to all three — applied with
    probability ``p`` per clip (``consistent``), per frame, or per
    ``seq_len`` block of frames, exactly the reference's three modes."""
    b, t = clips.shape[0], clips.shape[1]
    if consistent and seq_len == 0:
        n = b
        expand = (slice(None), None, None, None, None)
    elif seq_len == 0:
        n = b * t
        expand = (slice(None), None, None, None)
    else:
        n = b * ((t + seq_len - 1) // seq_len)
        expand = None  # handled below
    k_do, k_ch = jax.random.split(key)
    do = jax.random.uniform(k_do, (n,)) < p
    channel = jax.random.randint(k_ch, (n,), 0, 3)

    if seq_len:
        # one draw per seq_len block, broadcast over the block's frames
        blocks = (t + seq_len - 1) // seq_len
        do = jnp.repeat(do.reshape(b, blocks), seq_len, axis=1)[:, :t]
        channel = jnp.repeat(channel.reshape(b, blocks), seq_len,
                             axis=1)[:, :t]
        do = do.reshape(b * t)
        channel = channel.reshape(b * t)
        expand = (slice(None), None, None, None)

    if consistent and seq_len == 0:
        flat = clips
    else:
        flat = clips.reshape((b * t,) + clips.shape[2:])
    picked = jnp.take_along_axis(
        flat, channel[expand].astype(jnp.int32), axis=-1)
    gray = jnp.repeat(picked, 3, axis=-1)
    out = jnp.where(do[expand], gray, flat)
    return out if (consistent and seq_len == 0) else out.reshape(clips.shape)


# ---------------------------------------------------------------------------
# CoCLR clip-transform controllers (reference coclr_utils/augmentation.py)
# ---------------------------------------------------------------------------

def center_crop_normalize(clips_u8: Array, out_size: int,
                          dataset: str = "ucf101") -> Array:
    """The CoCLR 'null' transform: center crop + scale + normalize
    (reference augmentation.py null_transform usage in TwoClipTransform)."""
    h, w = clips_u8.shape[2], clips_u8.shape[3]
    top, left = (h - out_size) // 2, (w - out_size) // 2
    cropped = clips_u8[:, :, top:top + out_size, left:left + out_size, :]
    return normalize_only(cropped, dataset=dataset)


def rotate_clip(clips: Array, key, degree: float = 15.0,
                p: float = 1.0) -> Array:
    """RandomRotation (reference coclr_utils/augmentation.py:334-347):
    one angle in [-degree, degree] per clip, applied to every frame.

    Divergence (documented): the reference rotates with ``expand=True``
    (output canvas grows with the angle) — impossible under jit's static
    shapes; we rotate about the center on the fixed canvas with bilinear
    sampling and edge padding, which a following crop makes equivalent in
    practice. Operates on float clips (B, T, H, W, C) in [0, 1].
    """
    from jax.scipy.ndimage import map_coordinates

    b, t, h, w, c = clips.shape
    k_angle, k_do = jax.random.split(key)
    angles = jax.random.uniform(k_angle, (b,), minval=-degree, maxval=degree)
    do = jax.random.uniform(k_do, (b,)) < p
    theta = jnp.where(do, jnp.deg2rad(angles), 0.0)

    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0

    def rot_one(clip, th):
        cos, sin = jnp.cos(th), jnp.sin(th)
        src_y = cy + (yy - cy) * cos - (xx - cx) * sin
        src_x = cx + (yy - cy) * sin + (xx - cx) * cos

        def rot_frame_channel(img2d):
            return map_coordinates(img2d, [src_y, src_x], order=1,
                                   mode="nearest")

        # (T, H, W, C) -> map over T and C
        return jax.vmap(lambda fr: jax.vmap(
            rot_frame_channel, in_axes=-1, out_axes=-1)(fr))(clip)

    return jax.vmap(rot_one)(clips, theta)


@functools.partial(jax.jit, static_argnames=("out_size", "dataset", "p"))
def two_clip_transform(clip1_u8: Array, clip2_u8: Array, key, out_size: int,
                       dataset: str = "ucf101", p: float = 0.3
                       ) -> Tuple[Array, Array]:
    """TwoClipTransform (reference augmentation.py:383-408): each clip
    independently gets the base augmentation with probability ``p``, else
    the null (center-crop+normalize) transform."""
    k1, k2, kd1, kd2 = jax.random.split(key, 4)
    b = clip1_u8.shape[0]

    def mix(clips, k_aug, k_do):
        aug = train_augment(clips, k_aug, out_size, dataset=dataset)
        null = center_crop_normalize(clips, out_size, dataset=dataset)
        use_base = (jax.random.uniform(k_do, (b,)) < p)[:, None, None, None,
                                                        None]
        return jnp.where(use_base, aug, null)

    return mix(clip1_u8, k1, kd1), mix(clip2_u8, k2, kd2)


@functools.partial(jax.jit, static_argnames=("out_size", "dataset"))
def one_clip_transform(clip1_u8: Array, clip2_u8: Array, key, out_size: int,
                       dataset: str = "ucf101") -> Tuple[Array, Array]:
    """OneClipTransform (reference augmentation.py:411-435): randomly keep
    ONE of the two clips, return (base(x), null(x)) in random order."""
    k_pick, k_order, k_aug = jax.random.split(key, 3)
    b = clip1_u8.shape[0]
    pick1 = (jax.random.uniform(k_pick, (b,)) < 0.5)[:, None, None, None,
                                                     None]
    x = jnp.where(pick1, clip1_u8, clip2_u8)
    aug = train_augment(x, k_aug, out_size, dataset=dataset)
    null = center_crop_normalize(x, out_size, dataset=dataset)
    base_first = (jax.random.uniform(k_order, (b,)) < 0.5)[:, None, None,
                                                           None, None]
    return (jnp.where(base_first, aug, null),
            jnp.where(base_first, null, aug))


def two_crops_transform(clips_u8: Array, key, out_size: int,
                        dataset: str = "ucf101") -> Tuple[Array, Array]:
    """TwoCropsTransform (reference augmentation.py:452-461): two
    independent base augmentations of the same clip (query and key)."""
    k1, k2 = jax.random.split(key)
    return (train_augment(clips_u8, k1, out_size, dataset=dataset),
            train_augment(clips_u8, k2, out_size, dataset=dataset))


def transform_controller(fns, weights, key, *args, **kwargs):
    """TransformController (reference augmentation.py:438-450): weighted
    random choice among transform callables — host-side draw (the choice
    switches between differently-jitted programs)."""
    import numpy as np

    w = np.asarray(weights, np.float64)
    idx = int(np.random.default_rng(
        int(jax.random.randint(key, (), 0, 2**31 - 1))).choice(
            len(fns), p=w / w.sum()))
    return fns[idx](*args, **kwargs)
