"""Static rasterizer configuration.

Everything in this dataclass is hashable and treated as a jit-static
argument; per-call dynamic state (viewmatrix, campos, bg, sh degree,
scale_factor) is passed separately as arrays.

Constants mirror the reference CUDA configuration:
  near = 2.0 * scale_factor, far = 300.0 * scale_factor
  (cuda_rasterizer/auxiliary.h:20-21), low-pass FilterInvSquare = 2
  (auxiliary.h:22), alpha floor 1/255 and transmittance stop 1e-4
  (forward.cu:439-446), frustum margin 1.3 (auxiliary.h:182-204).
"""

from __future__ import annotations

import dataclasses
import math


NEAR_N = 2.0
FAR_N = 300.0
FILTER_INV_SQUARE = 2.0
ALPHA_EPS = 1.0 / 255.0
T_STOP = 1e-4
FRUSTUM_MARGIN = 1.3
MAX_ALPHA = 0.99


@dataclasses.dataclass(frozen=True)
class RasterSettings:
    height: int
    width: int
    vfov: tuple  # degrees (min, max)
    hfov: tuple  # degrees (min, max)
    num_extra_features: int = 0   # S: extra blended channels (t_scale, v)
    tile_h: int = 16              # BLOCK_Y (reference config.h:14)
    tile_w: int = 16              # BLOCK_X (reference config.h:13)
    pair_cap: int = 1 << 20       # K: max (gaussian, tile) instances
    tile_chunk: int = 64          # instances composited per scan step
    tile_list_cap: int = 4096     # max instances composited per tile
    backend: str = "xla"          # compositor: "xla" (differentiable) or
                                  # "pallas" (fast forward kernel)
    wrap_x: bool = False          # full-360 panorama: the x axis is
                                  # circular (splats wrap across the
                                  # phi = +-pi seam). The tile grid wraps
                                  # modulo tiles_x; when tiles_x*tile_w >
                                  # width the last tile is partial and its
                                  # out-of-range pixels are masked dead.
                                  # The reference has no analog — its CUDA
                                  # settings force two 180-degree halves
                                  # (gaussian_renderer/__init__.py:158-227).
    sort_depth_bits: int = 0      # 0 = auto (32 - tile-id bits). Pin to
                                  # make depth-bucket edges identical
                                  # across tile grids (tile-shape
                                  # invariance tests rely on this).
    compute_distortion: bool = True   # distortion moments (M1/M2/dist)
                                  # are a TRAINING loss term
                                  # (forward.cu:450-456); eval/bench
                                  # renders never read them, and skipping
                                  # the running moments + two sublane
                                  # prefix sums cuts ~25% of the
                                  # compositing kernel's VPU ops. Static:
                                  # False zeroes the dist/M1/M2 outputs.
    wrap_period: float = 0.0      # override for the dxp low-pass wrap
                                  # period in PIXELS (0 = auto: width when
                                  # wrap_x else none). A gaussian-sharded
                                  # slice renders a non-circular sub-grid
                                  # (wrap_x=False) of a circular GLOBAL
                                  # panorama: splat centers keep global
                                  # pixel x offsets, so the 2D pixel
                                  # distance must wrap at the GLOBAL
                                  # width (parallel/pano_shard.py).
    tight_rects: bool = True      # per-axis output-preserving tile rects:
                                  # the reference rasterizes the full
                                  # SQUARE of the cutoff ring's max extent
                                  # (forward.cu:129-171); tiles outside
                                  # the alpha >= 1/255 support (rho_eps =
                                  # 2*ln(255*op)) can never contribute a
                                  # pixel or a gradient, so they are
                                  # culled per axis (intersected with the
                                  # reference square — coverage only
                                  # shrinks). ~0.88x instances at the
                                  # bench shape; render output is
                                  # bit-identical (tested). False restores
                                  # the reference square.
    payload_bf16: bool = False    # prod/bench payload packing: the
                                  # 1 + C + S blend-side columns
                                  # (opacity, colors, extra features)
                                  # ride the post-sort gather as bf16
                                  # PAIRS in int32 words; the 9 conic T
                                  # columns stay f32 (bitcast to the
                                  # int domain for the moves). Trims the
                                  # width-priced slice of the K-row
                                  # payload gather + the chunk-table
                                  # transpose. Blend values quantize to
                                  # bf16 (~0.4% rel) so parity tests
                                  # keep False (pallas_fwd.pack_rows).
    compute_contrib: bool = True  # n_contrib (last contributor index per
                                  # pixel, contrib[0]) is a reference
                                  # output nothing downstream consumes
                                  # (parity tests only). The CUDA kernel
                                  # reads it off its serial loop counter
                                  # for free (forward.cu:434-448); the
                                  # vectorized kernel pays a 256-deep max
                                  # reduction per chunk, so prod/bench
                                  # configs set False (zeroes contrib[0];
                                  # the median bookkeeping is separate
                                  # and always on).
    payload_in_sort: bool = False # carry the render payload through the
                                  # binning sort as int32-bit-pattern
                                  # operands (permuted, never compared —
                                  # bit-exact) instead of a post-sort
                                  # K-row gather. Measured SLOWER at the
                                  # bench shape (sort payload ~1.5 ms
                                  # per operand at K=2.26M vs the
                                  # 18.3 ms gather it deletes) — kept as
                                  # a parity-tested alternate mode, not
                                  # the default. Compile is ~10-19 s per
                                  # operand, paid once per shape via
                                  # JAX_COMPILATION_CACHE_DIR.

    def __post_init__(self):
        object.__setattr__(self, "vfov", tuple(float(v) for v in self.vfov))
        object.__setattr__(self, "hfov", tuple(float(v) for v in self.hfov))
        assert not (self.payload_bf16 and self.backend != "pallas"), \
            "payload_bf16 packs rows for the pallas kernels only"

    @property
    def tiles_y(self) -> int:
        return (self.height + self.tile_h - 1) // self.tile_h

    @property
    def tiles_x(self) -> int:
        return (self.width + self.tile_w - 1) // self.tile_w

    @property
    def num_tiles(self) -> int:
        return self.tiles_y * self.tiles_x

    @property
    def tile_pixels(self) -> int:
        return self.tile_h * self.tile_w

    @property
    def angle_bounds(self):
        """(VFOV_min, VFOV_max, HFOV_min, HFOV_max) in radians
        (reference forward.cu:221-226)."""
        VFOV_max = math.pi / 2 - self.vfov[0] * math.pi / 180
        VFOV_min = math.pi / 2 - self.vfov[1] * math.pi / 180
        HFOV_max = self.hfov[1] * math.pi / 180
        HFOV_min = self.hfov[0] * math.pi / 180
        return VFOV_min, VFOV_max, HFOV_min, HFOV_max

    @property
    def dxp_wrap_period(self) -> float:
        """Pixel period of the 2D low-pass distance wrap (0 = no wrap)."""
        if self.wrap_period:
            return float(self.wrap_period)
        return float(self.width) if self.wrap_x else 0.0

    @property
    def depth_bits(self) -> int:
        """Bits of the uint32 sort key used for quantized depth; the rest
        hold the tile id (binning.py)."""
        tile_bits = max(1, (self.num_tiles + 1).bit_length())
        if self.sort_depth_bits:
            assert self.sort_depth_bits + tile_bits <= 32, \
                "sort_depth_bits leaves no room for the tile id"
            return self.sort_depth_bits
        return 32 - tile_bits
