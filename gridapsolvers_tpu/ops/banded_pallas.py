"""Pallas TPU kernel: VARIABLE-coefficient banded stencil matvec.

The banded StencilMatrix apply is the framework's general structured hot
path (bench.py "banded" row). The XLA lowering re-reads the x window once
per band from HBM when fusion spills; this kernel makes the traffic
explicit and minimal:

    per (row-tile, lane-tile) program:
      - ONE blocked copy of the band block (S, tile, L)   — the 27n bytes
        that dominate; optionally stored bf16 (native TPU reduced
        precision) to halve them
      - ONE manual DMA of the x halo window (tile+16, L+256) — row halo 8
        (sublane alignment), lane halo 128 (covers |dy,dz| shifts < 128)
      - S fused multiply-adds over shifted in-VMEM views

Edge handling is free by construction: the banded format stores ZERO for
out-of-grid neighbors (fem/assembly.py), so halo reads that fall into the
pad region are multiplied by zero bands.

Layout: grid (nx, ny[, nz]) viewed as (nx, m = prod(rest)); offsets
(dx, dy, dz) become (row shift dx, lane shift dz + nz*dy). Requires
lane shifts < 128 (true for ny, nz >= 3^d stencils when nz + 1 < 128 ...
i.e. transverse extent <= 127; assert at build).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tile, L, offsets, acc_dtype, bands_ref, xp_hbm, y_ref, xscr, sem):
    i = pl.program_id(0)
    j = pl.program_id(1)
    dma = pltpu.make_async_copy(
        xp_hbm.at[pl.ds(i * tile, tile + 16), pl.ds(j * L, L + 256)],
        xscr,
        sem,
    )
    dma.start()
    dma.wait()
    x_halo = xscr[:]
    acc = jnp.zeros((tile, L), acc_dtype)
    for s, (dx, lane) in enumerate(offsets):
        sh = jax.lax.slice(
            x_halo,
            (8 + dx, 128 + lane),
            (8 + dx + tile, 128 + lane + L),
        )
        acc = acc + bands_ref[s].astype(acc_dtype) * sh
    y_ref[:] = acc


@functools.partial(
    jax.jit,
    static_argnames=("nx_pad", "m", "L", "offsets", "tile", "interpret"),
)
def _banded_apply(bands, xpad, nx_pad, m, L, offsets, tile, interpret):
    ntr = nx_pad // tile
    ntl = m // L
    S = len(offsets)
    kernel = functools.partial(_kernel, tile, L, offsets, xpad.dtype)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nx_pad, m), xpad.dtype),
        grid=(ntr, ntl),
        in_specs=[
            pl.BlockSpec(
                (S, tile, L),
                lambda i, j: (0, i, j),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                memory_space=pl.ANY if interpret else pltpu.MemorySpace.HBM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tile, L), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((tile + 16, L + 256), xpad.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(bands, xpad)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PallasBandedStencil:
    """Pallas-kernel matvec over banded StencilMatrix data (flat vectors).
    Build with `pallas_banded_stencil(A, ...)`."""

    bands: jnp.ndarray          # (S, nx_pad, m) possibly bf16
    grid_shape: tuple = dataclasses.field(metadata=dict(static=True))
    offsets: tuple = dataclasses.field(metadata=dict(static=True))  # (dx, lane)
    nx: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))      # real width
    m_pad: int = dataclasses.field(metadata=dict(static=True))  # lane-padded
    nx_pad: int = dataclasses.field(metadata=dict(static=True))
    tile: int = dataclasses.field(metadata=dict(static=True))
    lane_tile: int = dataclasses.field(metadata=dict(static=True))
    interpret: bool = dataclasses.field(metadata=dict(static=True))

    @property
    def dtype(self):
        return jnp.float32 if self.bands.dtype == jnp.bfloat16 else self.bands.dtype

    @property
    def n(self):
        return self.nx * self.m

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def nnz(self):
        return len(self.offsets) * self.n

    def matvec(self, x):
        xg = x.reshape(self.nx, self.m)
        xpad = jnp.pad(
            xg,
            (
                (8, 8 + self.nx_pad - self.nx),
                (128, 128 + self.m_pad - self.m),
            ),
        )
        y = _banded_apply(
            self.bands,
            xpad,
            self.nx_pad,
            self.m_pad,
            self.lane_tile,
            self.offsets,
            self.tile,
            self.interpret,
        )
        return y[: self.nx, : self.m].reshape(-1)

    def diag(self):
        for s, (dx, lane) in enumerate(self.offsets):
            if dx == 0 and lane == 0:
                return (
                    self.bands[s, : self.nx]
                    .astype(self.dtype)
                    .reshape(-1)
                )
        raise ValueError("no center offset")

    def abs_row_sum(self):
        return (
            jnp.sum(jnp.abs(self.bands[:, : self.nx]), axis=0)
            .astype(self.dtype)
            .reshape(-1)
        )


def pallas_banded_stencil(
    A,
    tile: Optional[int] = None,
    lane_tile: Optional[int] = None,
    band_dtype=None,
    interpret: bool = False,
):
    """Factory: StencilMatrix -> PallasBandedStencil.

    band_dtype=jnp.bfloat16 halves the dominant HBM traffic (the bands);
    x and the accumulation stay f32.
    """
    if tile is None:
        # measured on v5e at 97^3 (interleaved sweep): tile=8 wins for BOTH
        # precisions because it admits the largest lane tile under the VMEM
        # budget (bf16 tile=8 -> full-width lane tile 9472: 0.101 ms vs
        # 0.128 at tile=16/lane=4736; f32 tile=8/lane=4736: 0.126 ms ~=
        # 100% of the f32 banded roofline)
        tile = 8
    gs = tuple(A.grid_shape)
    nx = gs[0]
    m = int(np.prod(gs[1:]))
    strides = np.cumprod([1] + list(gs[1:][::-1]))[:-1][::-1]
    offs = []
    for off in A.offsets:
        lane = int(sum(o * s for o, s in zip(off[1:], strides)))
        assert abs(int(off[0])) <= 1, "leading offset beyond +-1"
        assert abs(lane) < 128, (
            f"transverse lane shift {lane} >= 128: grid too narrow/wide "
            "for the lane-halo scheme"
        )
        offs.append((int(off[0]), lane))
    # lane-pad the transverse extent: dead lanes at each row's end carry
    # zero bands, and intra-row neighbor shifts never cross rows (dx is a
    # row shift), so the padding is inert
    m_pad = ((m + 127) // 128) * 128 if not interpret else m
    if lane_tile is None:
        # largest 128-multiple divisor of m_pad whose double-buffered band
        # block fits a ~12 MB VMEM budget — measured on v5e at 97^3:
        # large lane tiles win decisively (0.146 vs 0.19+ ms f32; 0.086 ms
        # bf16) because the x-halo overhead and per-program cost amortize
        S = len(offs)
        itemsize = 2 if band_dtype == jnp.bfloat16 else 4
        budget = int(12e6)
        lane_tile = m_pad if interpret else 128
        if not interpret:
            for cand in range(m_pad, 127, -128):
                if (
                    m_pad % cand == 0
                    and 2 * S * tile * cand * itemsize <= budget
                ):
                    lane_tile = cand
                    break
    assert m_pad % lane_tile == 0

    tile_eff = max(8, (tile // 8) * 8) if not interpret else max(tile, 1)
    nx_pad = ((nx + tile_eff - 1) // tile_eff) * tile_eff
    bands = np.asarray(A.bands).reshape(len(offs), nx, m)
    bands = np.pad(
        bands, ((0, 0), (0, nx_pad - nx), (0, m_pad - m))
    )
    bands_dev = jnp.asarray(
        bands, dtype=band_dtype or A.bands.dtype
    )
    return PallasBandedStencil(
        bands=bands_dev,
        grid_shape=gs,
        offsets=tuple(offs),
        nx=nx,
        m=m,
        m_pad=m_pad,
        nx_pad=nx_pad,
        tile=tile_eff,
        lane_tile=int(lane_tile),
        interpret=interpret,
    )
