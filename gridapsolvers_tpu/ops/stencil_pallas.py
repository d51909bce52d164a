"""Pallas TPU kernel: constant-coefficient 3^d-point stencil matvec.

The hot operator apply of the framework (ConstStencilMatrix, used by the
GMG benchmark path). Strategy:

- The grid (nx, ny, nz) is viewed as (nx, m) with m = ny*nz; y/z-neighbor
  offsets become LANE shifts of +-(dz + nz*dy), and x-neighbor offsets
  become SUBLANE row shifts. With full-boundary Dirichlet elimination every
  circular-wrap target lands on a constrained row, where the free-mask
  multiply zeroes it — so plain rolls are exact (no edge masking needed).
- The kernel tiles the leading axis. x stays in HBM and each program DMAs
  its (tile + 16, m) halo window into VMEM scratch (overlapping windows
  cannot be expressed with blocked BlockSpecs; Mosaic requires 8-row /
  128-lane aligned HBM slices, hence the 8-row halo pad and lane padding);
  free/y use standard blocked VMEM specs. Bands are 3^d scalars in SMEM.

HBM traffic: x (with halo), free mask, y out — ~3 values/point vs the
(3^d + 2)/point of a banded SpMV.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tile, m, offsets, w_ref, xp_hbm, free_ref, y_ref, xscr, sem):
    # m here is the LANE-PADDED width (multiple of 128); rolls use it as the
    # circular modulus — wrap-affected lanes are always masked rows
    # HBM DMA slices must be 8-row aligned, so the input carries an 8-row
    # pad on each side and each program copies the aligned window
    # [i*tile, i*tile + tile + 16); output row r sits at window row 8 + r.
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * tile, tile + 16), :], xscr, sem
    )
    dma.start()
    dma.wait()
    x_halo = xscr[:]
    free = free_ref[:]
    acc = jnp.zeros((tile, m), x_halo.dtype)
    for s, (dx, lane) in enumerate(offsets):
        shifted = jax.lax.slice_in_dim(x_halo, 8 + dx, 8 + dx + tile, axis=0)
        # out[i] = x[i + lane]  <=>  circular roll by (-lane) mod m
        sh = (-lane) % m
        if sh != 0:
            shifted = pltpu.roll(shifted, sh, axis=1)
        acc = acc + w_ref[0, s] * shifted
    # constrained-row passthrough ((1-free)*x_orig) is added by the caller:
    # the halo buffer holds the MASKED x, so it cannot supply x_orig here
    y_ref[:] = free * acc


@functools.partial(
    jax.jit, static_argnames=("nx", "m", "offsets", "tile", "interpret")
)
def _stencil_apply(weights, free2d, xpad2d, nx, m, offsets, tile, interpret):
    ntiles = nx // tile
    kernel = functools.partial(_kernel, tile, m, offsets)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx, m), xpad2d.dtype),
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((1, len(offsets)), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            # force HBM: under ANY the compiler may keep the array in VMEM,
            # where lane-unaligned memref slices are illegal
            pl.BlockSpec(
                memory_space=pl.ANY if interpret else pltpu.MemorySpace.HBM
            ),
            pl.BlockSpec((tile, m), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile + 16, m), xpad2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(weights, xpad2d, free2d)


import dataclasses


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasConstStencil:
    """Pallas-kernel matvec over ConstStencilMatrix data (flat vectors).
    A registered pytree so it can be passed as a jit argument like every
    other operator. Build with `pallas_const_stencil(A, tile=...)`."""

    weights: jnp.ndarray        # (1, n_offsets)
    free2d: jnp.ndarray         # (nx, m)
    free2d_pad: jnp.ndarray     # (nx_pad, m)
    grid_shape: tuple = dataclasses.field(metadata=dict(static=True))
    offsets: tuple = dataclasses.field(metadata=dict(static=True))
    nx: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    nx_pad: int = dataclasses.field(metadata=dict(static=True))
    m_pad: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return self.weights.dtype

    @property
    def shape(self):
        n = self.nx * self.m
        return (n, n)

    def _center_weight(self):
        for s, (dx, lane) in enumerate(self.offsets):
            if dx == 0 and lane == 0:
                return self.weights[0, s]
        raise ValueError("no center offset")

    def diag(self):
        free = self.free2d[:, : self.m]
        d = free * self._center_weight() + (1.0 - free)
        return d.reshape(-1)

    def abs_row_sum(self):
        free = self.free2d[:, : self.m]
        s = free * jnp.sum(jnp.abs(self.weights)) + (1.0 - free)
        return s.reshape(-1)

    def to_const(self):
        """Reconstruct the ConstStencilMatrix view (offsets decoded from
        lane strides) — used for densification/coarse factorization."""
        from ..algebra.stencil import ConstStencilMatrix

        gs = self.grid_shape
        strides = np.cumprod([1] + list(gs[1:][::-1]))[:-1][::-1]
        offsets = []
        for dx, lane in self.offsets:
            off = [dx]
            rem = lane
            for st in strides:
                # balanced-digit decode: per-dim offsets are in {-1, 0, 1}
                d = int(np.clip(np.round(rem / st), -1, 1))
                off.append(d)
                rem -= d * st
            assert rem == 0, (dx, lane, off)
            offsets.append(tuple(off))
        free = self.free2d[:, : self.m].reshape(gs)
        return ConstStencilMatrix(
            self.weights[0], free, tuple(offsets), gs
        )

    def todense(self):
        return self.to_const().todense()

    def to_ell(self):
        return self.to_const().to_ell()

    def matvec(self, x):
        xg = x.reshape(self.nx, self.m)
        xl = jnp.pad(xg, ((0, 0), (0, self.m_pad - self.m)))
        xm = self.free2d * xl
        xpad = jnp.pad(xm, ((8, 8 + self.nx_pad - self.nx), (0, 0)))
        y = _stencil_apply(
            self.weights,
            self.free2d_pad,
            xpad,
            self.nx_pad,
            self.m_pad,
            self.offsets,
            self.tile,
            self.interpret,
        )
        y = y[: self.nx, : self.m] + (1.0 - self.free2d[:, : self.m]) * xg
        return y.reshape(-1)


def pallas_const_stencil(A, tile: int = 8, interpret: bool = False):
    """Factory: ConstStencilMatrix -> PallasConstStencil."""
    gs = tuple(A.grid_shape)
    m = int(np.prod(gs[1:]))
    nx = gs[0]
    # Mosaic requires the sublane block dim divisible by 8: pad the leading
    # axis to a multiple of the tile (pad rows have free=0 so they
    # contribute nothing; output is sliced back)
    tile_eff = max(8, (tile // 8) * 8) if not interpret else max(tile, 1)
    nx_pad = ((nx + tile_eff - 1) // tile_eff) * tile_eff
    strides = np.cumprod([1] + list(gs[1:][::-1]))[:-1][::-1]
    offs = []
    for off in A.offsets:
        lane = int(sum(o * s for o, s in zip(off[1:], strides)))
        offs.append((int(off[0]), lane))
    weights = jnp.asarray(A.weights).reshape(1, -1)
    free2d = jnp.asarray(A.free).reshape(nx, m)
    # lane padding: Mosaic requires 128-aligned lane slices for the HBM
    # window DMA; circular-wrap garbage from the padded modulus only lands
    # on masked (free=0) positions
    m_pad = ((m + 127) // 128) * 128 if not interpret else m
    free2d_lanes = jnp.pad(free2d, ((0, 0), (0, m_pad - m)))
    free2d_pad = jnp.pad(free2d_lanes, ((0, nx_pad - nx), (0, 0)))
    return PallasConstStencil(
        weights=weights,
        free2d=free2d_lanes,
        free2d_pad=free2d_pad,
        grid_shape=gs,
        offsets=tuple(offs),
        nx=nx,
        m=m,
        nx_pad=nx_pad,
        m_pad=m_pad,
        tile=tile_eff,
        interpret=interpret,
    )
