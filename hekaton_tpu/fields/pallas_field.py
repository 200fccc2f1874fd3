"""Pallas TPU kernel: fused CIOS Montgomery multiply over 16-bit limbs.

The XLA path (jax_field.mont_mul) computes REDC as three separate limb
products whose (n, 32) column intermediates round-trip through HBM. This
kernel keeps the whole interleaved CIOS loop in VMEM with the batch dimension
on the vector lanes:

  layout: limbs on sublanes, batch on lanes — a block is (16, BLK) u32 and
  every op is a dense (16, BLK) VPU op; the running accumulator is (17, BLK)
  redundant columns (< 2^23, canonicalized once at the end).

  per round i (16 rounds):  t += a_i * b  (lo/hi split),
                            m  = t_0 * (-p^-1 mod 2^16)  (16-bit ninv),
                            t += m * p    (lo/hi split),
                            t >>= one limb (sublane shift).

Interface arrays stay in the framework-wide (n, 16) layout; the kernel
transposes at the block boundary. On non-TPU backends the kernel runs in
interpreter mode (slow, used only by tests).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bn254 import LIMB_BITS, LIMB_MASK, NLIMBS
from .jax_field import FieldSpec

u32 = jnp.uint32
MASK = np.uint32(LIMB_MASK)

BLK = 1024  # batch lanes per block: (16, 1024) u32 tiles in VMEM


def _kernel(p_ref, a_ref, b_ref, o_ref, *, p_limbs, ninv0):
    # blocks are (BLK, nl); work limbs-first (nl = limb count of the field)
    nl = len(p_limbs)
    a = a_ref[:].T  # (nl, BLK)
    b = b_ref[:].T
    blk = a.shape[1]

    p_col = p_ref[:]  # (16, 1) modulus limbs
    zero_row = jnp.zeros((1, blk), u32)

    # t: (17, BLK) redundant columns. Mosaic has no scatter/slice-add; pad
    # partial rows to the full height and use whole-array adds.
    def at_lo(x):  # contributes to rows [0, 16)
        return jnp.concatenate([x, zero_row], axis=0)

    def at_hi(x):  # contributes to rows [1, 17)
        return jnp.concatenate([zero_row, x], axis=0)

    t = jnp.zeros((nl + 1, blk), u32)
    for i in range(nl):
        ai = a[i : i + 1, :]  # (1, BLK)
        prod = ai * b  # (nl, BLK) — 16x16-bit products, exact in u32
        plo = prod & MASK
        phi = prod >> LIMB_BITS
        # only lo(prod[0]) lands in column 0, so m folds it in directly and
        # the a_i*b / m*p contributions merge into ONE padded add pair
        m = ((t[0:1, :] + plo[0:1, :]) * np.uint32(ninv0)) & MASK  # (1, BLK)
        q = m * p_col  # (16, BLK)
        t = t + at_lo(plo + (q & MASK)) + at_hi(phi + (q >> LIMB_BITS))
        # column 0 is now divisible by 2^16: fold its carry up and shift down
        carry = t[0:1, :] >> LIMB_BITS
        t = jnp.concatenate([t[1:2, :] + carry, t[2:, :], zero_row], axis=0)

    # canonicalize the nl+1 redundant columns (values < 2^23)
    out_rows = []
    carry = jnp.zeros((1, blk), u32)
    for k in range(nl):
        v = t[k : k + 1, :] + carry
        out_rows.append(v & MASK)
        carry = v >> LIMB_BITS
    # CIOS bound: result < 2p; top carry folds into a 17th limb, handled by
    # the conditional subtraction below (p < 2^254 so result-with-carry still
    # compares correctly via the borrow chain)
    r = jnp.concatenate(out_rows, axis=0)  # (nl, BLK)
    top = carry  # (1, BLK), 0 or 1

    # conditional subtract: r - p with borrow chain (nl static steps)
    borrow = jnp.zeros((1, blk), u32)
    diff_rows = []
    for k in range(nl):
        d = r[k : k + 1, :] - jnp.asarray(p_limbs[k], u32) - borrow
        diff_rows.append(d & MASK)
        borrow = (d >> LIMB_BITS) & 1  # 1 iff wrapped (u32 underflow)
    diff = jnp.concatenate(diff_rows, axis=0)
    # subtract if r >= p: i.e. top carry set, or no borrow
    take_diff = jnp.logical_or(top == 1, borrow == 0)  # (1, BLK)
    out = jnp.where(take_diff, diff, r)  # broadcast over sublanes
    o_ref[:] = out.T


@functools.lru_cache(maxsize=None)
def _build(modulus: int, name: str, nlimbs: int, n_blocks: int, interpret: bool):
    spec = FieldSpec(modulus, name, nlimbs=nlimbs)
    p_limbs = tuple(int(x) for x in spec.p_limbs)
    ninv0 = int(spec.ninv_limbs[0])
    nl = nlimbs

    kern = functools.partial(_kernel, p_limbs=p_limbs, ninv0=ninv0)

    p_arr = np.array(p_limbs, dtype=np.uint32).reshape(nl, 1)

    def call(a, b):
        n = a.shape[0]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, nl), u32),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec((nl, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(jnp.asarray(p_arr), a, b)

    return call


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:  # noqa: BLE001
        return False


# ---------------------------------------------------------------------------
# In-kernel Fermat inversion: a^(p-2) with the whole square-and-multiply
# chain in VMEM — ONE launch instead of ~254 fori iterations of XLA ops.
# Used by jax_field.batch_inv as the tree root stage (widths <= BLK), where
# the XLA-loop Fermat would dominate the per-call overhead.
# ---------------------------------------------------------------------------


def _tile_mul_generic(a, b, p_col, nl, ninv0):
    """(nl, blk) CIOS Montgomery product — the _kernel body as a reusable
    tile function (generic over the limb count)."""
    blk = a.shape[1]
    zero_row = jnp.zeros((1, blk), u32)

    def at_lo(x):
        return jnp.concatenate([x, zero_row], axis=0)

    def at_hi(x):
        return jnp.concatenate([zero_row, x], axis=0)

    t = jnp.zeros((nl + 1, blk), u32)
    for i in range(nl):
        prod = a[i : i + 1, :] * b
        plo = prod & MASK
        phi = prod >> LIMB_BITS
        m = ((t[0:1, :] + plo[0:1, :]) * np.uint32(ninv0)) & MASK
        q = m * p_col
        t = t + at_lo(plo + (q & MASK)) + at_hi(phi + (q >> LIMB_BITS))
        carry = t[0:1, :] >> LIMB_BITS
        t = jnp.concatenate([t[1:2, :] + carry, t[2:, :], zero_row], axis=0)

    out_rows = []
    carry = jnp.zeros((1, blk), u32)
    for k in range(nl):
        v = t[k : k + 1, :] + carry
        out_rows.append(v & MASK)
        carry = v >> LIMB_BITS
    r = jnp.concatenate(out_rows, axis=0)
    top = carry

    borrow = jnp.zeros((1, blk), u32)
    diff_rows = []
    for k in range(nl):
        d = r[k : k + 1, :] - p_col[k : k + 1, :] - borrow
        diff_rows.append(d & MASK)
        borrow = (d >> LIMB_BITS) & 1
    diff = jnp.concatenate(diff_rows, axis=0)
    take_diff = jnp.logical_or(top == 1, borrow == 0)
    return jnp.where(take_diff, diff, r)


def _fermat_kernel(bits_ref, p_ref, a_ref, o_ref, *, nl, ninv0, one_mont, nbits):
    base0 = a_ref[:].T  # (nl, blk)
    blk = base0.shape[1]
    p_col = p_ref[:]
    one = jnp.concatenate(
        [jnp.full((1, blk), np.uint32(v), u32) for v in one_mont], axis=0
    )

    def body(i, carry):
        acc, base = carry
        mul = _tile_mul_generic(acc, base, p_col, nl, ninv0)
        acc = jnp.where(bits_ref[i] == 1, mul, acc)
        base = _tile_mul_generic(base, base, p_col, nl, ninv0)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, nbits, body, (one, base0))
    o_ref[:] = acc.T


@functools.lru_cache(maxsize=None)
def _build_fermat(modulus: int, name: str, nlimbs: int, n_blocks: int, interpret: bool):
    spec = FieldSpec(modulus, name, nlimbs=nlimbs)
    nl = spec.nlimbs
    kern = functools.partial(
        _fermat_kernel,
        nl=nl,
        ninv0=int(spec.ninv_limbs[0]),
        one_mont=tuple(int(x) for x in spec.one_mont),
        nbits=int(spec.inv_exp_bits.shape[0]),
    )
    p_arr = np.asarray(spec.p_limbs, np.uint32).reshape(nl, 1)
    bits = np.asarray(spec.inv_exp_bits, np.int32)

    def call(a):
        n = a.shape[0]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, nl), u32),
            grid=(n_blocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((nl, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLK, nl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(jnp.asarray(bits), jnp.asarray(p_arr), a)

    return call


def fermat_inv_pallas(spec: FieldSpec, a):
    """Batched a^(p-2) (Montgomery form; inv(0) = 0, matching mont_inv) as a
    single fused kernel. Intended for narrow batches (tree roots): blocks run
    sequentially, each paying the full 2x~bitlen in-VMEM multiply chain."""
    a = jnp.asarray(a, u32)
    orig_shape = a.shape
    a2 = a.reshape(-1, spec.nlimbs)
    n = a2.shape[0]
    m = ((n + BLK - 1) // BLK) * BLK
    if m != n:
        a2 = jnp.concatenate([a2, jnp.zeros((m - n, spec.nlimbs), u32)])
    call = _build_fermat(spec.modulus, spec.name, spec.nlimbs, m // BLK, interpret=not _on_tpu())
    return call(a2)[:n].reshape(orig_shape)


def mont_mul_pallas(spec: FieldSpec, a, b):
    """Drop-in for jax_field.mont_mul on (n, nlimbs) u32 Montgomery operands.

    Pads the batch to a BLK multiple; falls back to interpreter mode off-TPU.
    """
    a = jnp.asarray(a, u32)
    b = jnp.broadcast_to(jnp.asarray(b, u32), a.shape)
    orig_shape = a.shape
    nl = spec.nlimbs
    a2 = a.reshape(-1, nl)
    b2 = b.reshape(-1, nl)
    n = a2.shape[0]
    m = ((n + BLK - 1) // BLK) * BLK
    if m != n:
        pad = m - n
        a2 = jnp.concatenate([a2, jnp.zeros((pad, nl), u32)])
        b2 = jnp.concatenate([b2, jnp.zeros((pad, nl), u32)])
    call = _build(spec.modulus, spec.name, nl, m // BLK, interpret=not _on_tpu())
    out = call(a2, b2)
    return out[:n].reshape(orig_shape)
