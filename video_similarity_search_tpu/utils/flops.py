"""Analytic FLOP counts for the benchmark encoders.

Counts multiply-add FLOPs (2 * MACs) of every convolution and dense layer
in the 3-D ResNet forward (reference architecture models/resnet.py:100-312)
so the bench can report measured TFLOP/s and MFU against the chip roofline
— making the throughput target falsifiable instead of resting on an
unpublished A100 estimate (SURVEY §6: the reference publishes no numbers).
"""

from __future__ import annotations

from typing import Sequence, Tuple

_DEPTH_TO_SPEC = {
    10: ("basic", (1, 1, 1, 1)),
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
    200: ("bottleneck", (3, 24, 36, 3)),
}


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def resnet3d_flops_per_clip(
    depth: int = 18,
    t: int = 16,
    size: int = 128,
    in_channels: int = 3,
    conv1_t_size: int = 7,
    conv1_t_stride: int = 1,
    no_max_pool: bool = True,
    widen_factor: float = 1.0,
    projection_head: bool = True,
    hidden_layer: int = 2048,
    out_dim: int = 128,
) -> int:
    """FLOPs (2*MACs) for one clip through the ResNet3D forward.

    Mirrors the layer dims of models/resnet3d.py: conv1 stride
    (conv1_t_stride, 2, 2); stages 2-4 stride 2 in all three dims;
    shortcut-B 1x1x1 downsample convs counted. Elementwise/BN/pool FLOPs
    are ignored (<1% of total).
    """
    block, layers = _DEPTH_TO_SPEC[depth]
    expansion = 1 if block == "basic" else 4
    planes = [int(p * widen_factor) for p in (64, 128, 256, 512)]

    def conv_flops(out_thw: Tuple[int, int, int], k: Sequence[int],
                   cin: int, cout: int) -> int:
        ot, oh, ow = out_thw
        return 2 * ot * oh * ow * cout * k[0] * k[1] * k[2] * cin

    flops = 0
    T, H, W = _ceil_div(t, conv1_t_stride), size // 2, size // 2
    flops += conv_flops((T, H, W), (conv1_t_size, 7, 7), in_channels,
                        planes[0])
    ch = planes[0]
    if not no_max_pool:
        T, H, W = _ceil_div(T, 2), _ceil_div(H, 2), _ceil_div(W, 2)

    for stage, (p, n_blocks) in enumerate(zip(planes, layers)):
        stage_stride = 1 if stage == 0 else 2
        out_ch = p * expansion
        for b in range(n_blocks):
            s = stage_stride if b == 0 else 1
            oT, oH, oW = _ceil_div(T, s), _ceil_div(H, s), _ceil_div(W, s)
            if block == "basic":
                flops += conv_flops((oT, oH, oW), (3, 3, 3), ch, p)
                flops += conv_flops((oT, oH, oW), (3, 3, 3), p, p)
            else:
                flops += conv_flops((T, H, W), (1, 1, 1), ch, p)
                flops += conv_flops((oT, oH, oW), (3, 3, 3), p, p)
                flops += conv_flops((oT, oH, oW), (1, 1, 1), p, out_ch)
            if s != 1 or ch != out_ch:  # shortcut-B downsample conv
                flops += conv_flops((oT, oH, oW), (1, 1, 1), ch, out_ch)
            T, H, W, ch = oT, oH, oW, out_ch

    if projection_head:
        flops += 2 * ch * hidden_layer + 2 * hidden_layer * out_dim
    return flops


def model_flops_per_clip(model, example_input, train: bool = False) -> int:
    """FLOPs (2*MACs) per clip for ANY flax encoder, counted from the
    model's own conv/dense layers — no per-architecture formula.

    Captures every ``nn.Conv``/``nn.Dense`` output under ``jax.eval_shape``
    (abstract, no memory/compute) and pairs it with the layer's kernel
    param: conv FLOPs = 2 * out_positions * prod(kernel_shape) where the
    5-d kernel (kt,kh,kw,cin/groups,cout) already encodes grouped convs;
    dense FLOPs = 2 * leading_positions * prod(kernel_shape). Same
    convention as :func:`resnet3d_flops_per_clip` (elementwise/BN/pool
    ignored; validated equal on R3D-18 — tests/test_models.py). Einsum
    affinities inside Nonlocal blocks are NOT counted (the default
    SlowFast/S3D configs instantiate none).

    ``example_input`` is a batched clip (or [slow, fast] list for
    SlowFast); the returned count is per single clip.
    """
    import jax
    import flax.linen as nn

    def init_fn():
        return model.init(jax.random.key(0), example_input, train=train)

    variables = jax.eval_shape(init_fn)

    def apply_fn(variables):
        return model.apply(
            variables, example_input, train=train,
            capture_intermediates=lambda mdl, name: isinstance(
                mdl, (nn.Conv, nn.Dense)),
            mutable=["intermediates", "batch_stats"],
            rngs={"dropout": jax.random.key(0)} if train else {},
        )

    _, captured = jax.eval_shape(apply_fn, variables)

    def walk(params, inter, flops=0):
        for key, sub in inter.items():
            if key == "__call__":
                continue
            if "__call__" in sub:  # a captured Conv/Dense leaf module
                out = sub["__call__"][0]
                kernel = params[key]["kernel"]
                k_flops = 2 * _prod(kernel.shape)
                # out.shape[0] is the batch dim; dims [1:-1] are the
                # per-clip output positions (empty for a (B, F) dense)
                if kernel.ndim > 2:  # conv: every output position
                    flops += k_flops * _prod(out.shape[1:-1])
                else:  # dense over possibly-batched leading dims
                    flops += k_flops * max(1, _prod(out.shape[1:-1]))
            else:
                flops = walk(params[key], sub, flops)
        return flops

    return walk(variables["params"], captured["intermediates"])


def _prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


# bf16 dense peak per chip, from published TPU/GPU specs.
PEAK_TFLOPS = {
    "v5e": 197.0,  # TPU v5e bf16
    "v5p": 459.0,
    "v4": 275.0,
    "v6e": 918.0,
    "a100": 312.0,  # A100 SXM bf16 dense (for derivations only)
}

# jax reports marketing-free device_kind strings: v5e = "TPU v5 lite"
# (also "TPU v5 litepod"), v5p = "TPU v5", v6e = "TPU v6 lite",
# v4 = "TPU v4". Substring-matching the short names against these finds
# NOTHING ("v5e" is not in "tpu v5 lite") and everything silently fell
# back to the v5e peak — wrong MFU by 2.3-4.7x on v5p/v6e. Ordered
# patterns, most specific first ("v5 lite" must match before "v5").
_KIND_PATTERNS = (
    ("v6 lite", "v6e"), ("v6e", "v6e"),
    ("v5 lite", "v5e"), ("v5litepod", "v5e"), ("v5e", "v5e"),
    ("v5p", "v5p"), ("v5", "v5p"),
    ("v4", "v4"),
    ("a100", "a100"),
)


def chip_peak_tflops(device_kind: str) -> float:
    """Best-effort map of jax device_kind to bf16 peak TFLOP/s."""
    kind = device_kind.lower()
    for pattern, key in _KIND_PATTERNS:
        if pattern in kind:
            return PEAK_TFLOPS[key]
    return PEAK_TFLOPS["v5e"]  # the target hardware (BASELINE.md)
