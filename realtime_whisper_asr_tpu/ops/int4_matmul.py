"""Pallas TPU kernel: int8-activation × nibble-packed int4 weight matmul.

Why a hand-written kernel: decode at small batch is weight-bandwidth-bound —
step time ≈ decoder bytes / HBM rate (ROADMAP round-3 measurements: int8
streams 910 MB at ~430-560 GB/s effective). The packed-int4 layout
(quant._pack_int4) halves the bytes again, but XLA cannot exploit it: the
S4→S8 convert of the bitcast view is materialized in HBM before the dot, so
the XLA int4 path runs at measured step-time PARITY with int8 (round-4
microbench). This kernel streams the PACKED bytes HBM→VMEM and unpacks
nibbles in VMEM right before the MXU dots, so HBM sees only 4 bits/weight —
the speed-of-light formulation for the int4 tier.

Numerics: the kernel folds each 128-input-row group's f32 scale
(quant.INT4_GROUP) into bf16 weight planes before the dot — one bf16
rounding of q·s, ≤0.4% relative, an order of magnitude below the int4
quantization error itself (test_whisper_model.py locks ≤2% agreement with
the XLA grouped-int32 path). Low nibble = even input row, high nibble = odd
input row (quant._pack_int4), so the XLA-side even/odd activation split
feeds lo/hi dots whose sum reconstructs the full-K dot.

Reference analog: CTranslate2's fused int8 GEMMs (the backend behind
asr_components.py:264); CT2 has no int4 tier on GPU — this goes one beyond.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["int4_matmul", "use_pallas_int4"]

#: output tile along N. All decoder linear output dims (1280, 3840 fused
#: qkv, 5120 mlp, and the test sizes' multiples of 128) divide by 128; 128
#: keeps the whole unpack's VMEM transients (≈5 MB at K=5120) well inside
#: the ~16 MB budget with pipeline double buffering.
_TN = 128


def _kernel(xlo_ref, xhi_ref, wp_ref, s_ref, o_ref, *, m, half, tn, g):
    """One N-tile: unpack the packed block's nibbles in VMEM, fold the
    per-group scales into bf16 weight planes, and run TWO full-K MXU dots
    (even rows × low-nibble plane + odd rows × high-nibble plane).

    Mosaic legalization notes (v5e, measured round 4): int8 vector shifts
    (`arith.shli`) and int8 vector compares (`arith.cmpi`) do NOT legalize —
    the unpack must run in the int32 domain (and/compare/select on int32
    legalize; this is the formulation the first working kernel used). The
    signed low nibble is bitwise-and + select; the high one is an exact
    ×1/16 in f32 ((p − u) is a multiple of 16 in [−128, 112]). A first
    version dotted each 128-row scale group separately to keep int32-exact
    partials; the 20–80 tiny (m,64)@(64,tn) dots per tile ran at 86 GB/s
    effective — 3× SLOWER than XLA int8 (BENCH r4 int4all_phases, decode
    6.0 ms/token). Folding the scale into the weight plane costs one bf16
    rounding of q·s (≤0.4% relative — an order below the int4 quantization
    error itself) and turns the tile into two dense (m, K/2)@(K/2, tn) dots
    at proper MXU utilization."""
    p = wp_ref[:].astype(jnp.int32)  # int8 (half, tn) widened for legal ops
    u = jnp.bitwise_and(p, 15)  # unsigned low nibble 0..15
    lo = (u - jnp.where(u > 7, 16, 0)).astype(jnp.bfloat16)
    hi = ((p - u).astype(jnp.float32) * 0.0625).astype(jnp.bfloat16)
    rows = half // g  # packed rows per scale group
    # np.repeat-style row expansion (pltpu.repeat TILES - wrong semantics)
    se = jnp.broadcast_to(
        s_ref[:].astype(jnp.bfloat16)[:, None, :], (g, rows, tn)
    ).reshape(half, tn)
    o_ref[:] = jnp.dot(
        xlo_ref[:], lo * se, preferred_element_type=jnp.float32
    ) + jnp.dot(xhi_ref[:], hi * se, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def int4_matmul(xq: jnp.ndarray, wp: jnp.ndarray, s: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """(M, K) int8 activations × packed {wp (K/2, N) int8, s (G, N) f32}
    -> (M, N) f32 of sum_g s[g] * (xq_g · unpack(wp)_g). The caller applies
    its activation scale afterwards (model._linear does y * sx)."""
    m, k = xq.shape
    half, n = wp.shape
    g = s.shape[0]
    assert k == 2 * half and n % _TN == 0 and half % g == 0
    # even/odd input-row split matches the (low, high) nibble packing; done
    # outside the kernel (a cheap strided slice of the small activation
    # matrix). bf16 is exact for int8 activation values (≤ 127 < 2^8).
    xlo = xq[:, 0::2].astype(jnp.bfloat16)
    xhi = xq[:, 1::2].astype(jnp.bfloat16)
    kern = functools.partial(_kernel, m=m, half=half, tn=_TN, g=g)
    flops = 2 * m * k * n
    return pl.pallas_call(
        kern,
        grid=(n // _TN,),
        in_specs=[
            pl.BlockSpec((m, half), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m, half), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((half, _TN), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, _TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, _TN), lambda j: (0, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=half * n + 4 * g * n + 2 * m * half + 4 * m * n,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xlo, xhi, wp, s)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def use_pallas_int4(m: int, half: int, n: int, g: int) -> bool:
    """Route model._linear's int4 dot through the Pallas kernel? True on TPU
    backends for decode-sized row counts (the bandwidth-bound regime the
    kernel exists for) when the weight meets the kernel's tiling: N divides
    into _TN output tiles and each scale group spans a sublane-aligned packed
    row count (real whisper dims all qualify; test-tiny's d=64 does not).
    Prefill-sized M stays on the XLA path, which tiles large-M MXU work
    better. RWA_NO_PALLAS_INT4=1 is the A/B escape hatch. Decided at TRACE
    time (per jit specialization), so each bucketed shape picks its path
    once."""
    if os.environ.get("RWA_NO_PALLAS_INT4"):
        return False
    tiles_ok = n % _TN == 0 and half % g == 0 and (half // g) % 32 == 0
    # m <= 8: at serving batch the weight read amortizes across rows while
    # the kernel's VPU unpack cost stays proportional to the weights, and
    # the XLA path wins (measured round 4: 16-stream aggregate RTF 0.0566
    # via kernel vs 0.0456 int8 XLA). Batch-1 greedy + small beams are the
    # weight-bandwidth-bound regime the kernel targets.
    return m <= 8 and tiles_ok and _on_tpu()
