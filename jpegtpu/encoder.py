"""Top-level encoder: uint8 RGB image(s) -> complete JFIF/JPEG bytes.

The TPU-native replacement for the reference's driver (JpegEncoderHost +
main, src/OpenCLProject_JpegEncoder.cpp:28-633). Where the reference
round-trips through host memory between every stage (SURVEY §3.1), here the
whole pipeline — color transform, subsampling, fused DCT/quant/zigzag,
RLE/Huffman symbolization and bitstream packing — is ONE jit-compiled device
program; the host only supplies pixels and receives stuffed entropy segments
to splice between markers. And unlike the reference, the output is a real,
decodable JPEG file (SURVEY §2.10).
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jpegtpu.config import EncoderConfig
from jpegtpu.container import jfif
from jpegtpu.core import ops
from jpegtpu.entropy import assemble, scan


def _device_encode(img: jax.Array, *, quality: int, subsampling: str,
                   restart: int, n_seg: int, blocks_per_seg: int,
                   use_pallas: bool):
    """The fused device program: pixels -> packed stuffed segments.

    img: uint8 [H, W, 3] (H, W already arbitrary; padding happens inside).
    Returns (stuffed [n_seg, cap] uint8, stuffed_nbytes [n_seg] i32,
    seg_bits [n_seg] i32).
    """
    n_luma = 4 if subsampling == "420" else 1
    if use_pallas:
        from jpegtpu.kernels import fused_dctq
        coeffs = fused_dctq.encode_blocks(img, quality, subsampling)
    else:
        coeffs = ops.encode_blocks(img, quality, subsampling)
    n_mcu, b, _ = coeffs.shape
    lens, bits = scan.symbolize_scan(coeffs, n_luma, restart)
    pad = n_seg * (blocks_per_seg // b) - n_mcu
    if pad:
        lens = jnp.concatenate(
            [lens, jnp.zeros((pad, b, 64), lens.dtype)], axis=0)
        bits = jnp.concatenate(
            [bits, jnp.zeros((pad, b, 64), bits.dtype)], axis=0)
    return assemble.pack_segments(lens.reshape(-1, 64), bits.reshape(-1, 64),
                                  n_seg, blocks_per_seg)


@functools.lru_cache(maxsize=64)
def _jitted_encode(shape: Tuple[int, int], cfg: EncoderConfig):
    """Compiled device program for one (H, W) geometry + config."""
    h, w = shape
    my, mx = ops.mcu_grid(h, w, cfg.subsampling)
    n_mcu = my * mx
    restart = cfg.resolve_restart(mx)
    n_seg = -(-n_mcu // restart) if restart > 0 else 1
    mcus_per_seg = restart if restart > 0 else n_mcu
    blocks_per_seg = mcus_per_seg * cfg.blocks_per_mcu
    fn = functools.partial(
        _device_encode, quality=cfg.quality, subsampling=cfg.subsampling,
        restart=restart, n_seg=n_seg, blocks_per_seg=blocks_per_seg,
        use_pallas=cfg.use_pallas)
    return jax.jit(fn), restart, n_seg


class Encoder:
    """Reusable encoder; compiled programs are cached per image geometry."""

    def __init__(self, config: EncoderConfig | None = None):
        self.config = config or EncoderConfig()

    def encode_to_segments(self, img: np.ndarray):
        """Run the device pipeline; returns (stuffed, nbytes, restart)."""
        if img.ndim != 3 or img.shape[2] != 3:
            raise ValueError(f"expected [H, W, 3] RGB, got {img.shape}")
        h, w = img.shape[:2]
        fn, restart, _ = _jitted_encode((h, w), self.config)
        stuffed, nbytes, seg_bits = fn(jnp.asarray(img))
        return stuffed, nbytes, restart

    def encode(self, img: np.ndarray) -> bytes:
        """uint8 RGB [H, W, 3] -> complete JFIF/JPEG bytes."""
        h, w = img.shape[:2]
        stuffed, nbytes, restart = self.encode_to_segments(img)
        scan_bytes = assemble.assemble_scan_host(
            np.asarray(stuffed), np.asarray(nbytes), restart)
        return jfif.wrap_jpeg(h, w, self.config.quality,
                              self.config.subsampling, restart, scan_bytes)


def encode(img: np.ndarray, quality: int = 50, subsampling: str = "420",
           restart_interval: int | str = "rows", **kw) -> bytes:
    """One-shot convenience wrapper."""
    cfg = EncoderConfig(quality=quality, subsampling=subsampling,
                        restart_interval=restart_interval, **kw)
    return Encoder(cfg).encode(img)


def encode_batch(imgs: Sequence[np.ndarray], **kw) -> List[bytes]:
    """Encode a batch (shared Encoder, so same-geometry images share one
    compiled program). The sharded batch path lives in jpegtpu.dist."""
    cfg = EncoderConfig(**kw) if kw else EncoderConfig()
    enc = Encoder(cfg)
    return [enc.encode(im) for im in imgs]
