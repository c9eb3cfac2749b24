"""Vector -> raster: render slippy-map tile IMAGES from point data.

The reference's end product is a slippy-map tile layer over OSM-derived
features; this pipeline closes the raster side of the raster↔vector
loop: points are tile-assigned at zoom ``z``, each tile's points are
binned into a ``tile_px`` x ``tile_px`` count grid (sub-pixel position
from the fractional tile coordinate — the same floor arithmetic the
tile assign uses, so binning is engine-exact), the grid is tone-mapped
to uint8 and ENCODED THROUGH THE ENGINE'S OWN IMAGE CODEC (pngz =
zlib-compressed raw — deterministic bytes, so the payload md5 is part
of the oracle contract).

Shuffle shape: one explode pass adds (x, y, px-bin) columns; tiles
shuffle on a coarse ``tile_key %% parts`` shard and each task renders
its run of tiles from a sort + run-scan — the same batched-regroup
pattern as way assembly (no per-tile task dispatch).
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .. import codecs, tiles
from .spatial import points_from_documents

RASTER_PARTS = 16


def _explode_bins(batch: pa.Table, z: int, tile_px: int) -> pa.Table:
    lon = batch["lon"].to_numpy()
    lat = batch["lat"].to_numpy()
    x, y = tiles.tile_xy(lon, lat, z)
    n = np.int64(1) << z
    # fractional position inside the tile -> pixel bin (same floor math
    # as the tile assign, one level deeper)
    u = (lon + 180.0) / 360.0 * n - x
    lat_c = np.clip(lat, -tiles.MERC_LAT_LIMIT, tiles.MERC_LAT_LIMIT)
    lat_rad = np.radians(lat_c)
    merc = (1.0 - np.arcsinh(np.tan(lat_rad)) / np.pi) / 2.0 * n - y
    px = np.clip(np.floor(u * tile_px), 0, tile_px - 1).astype(np.int64)
    py = np.clip(np.floor(merc * tile_px), 0, tile_px - 1).astype(np.int64)
    key = (x << np.int64(32)) | y
    return pa.table(
        {
            "tile_key": pa.array(key),
            "pix": pa.array(py * tile_px + px),
            "shard": pa.array((key % RASTER_PARTS).astype(np.int64)),
        }
    )


def _render_shard(g: pd.DataFrame, z: int, tile_px: int) -> pd.DataFrame:
    g = g.sort_values(["tile_key", "pix"], kind="mergesort")
    keys = g["tile_key"].to_numpy()
    pix = g["pix"].to_numpy()
    bounds = np.nonzero(np.diff(keys))[0] + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(keys)]])
    out = {"x": [], "y": [], "n_points": [], "n_bytes": [], "payload_md5": [], "pixel_sum": []}
    for s, e in zip(starts, ends):
        key = int(keys[s])
        counts = np.bincount(pix[s:e], minlength=tile_px * tile_px)
        grid = np.minimum(counts, 255).astype(np.uint8).reshape(tile_px, tile_px)
        rgb = np.repeat(grid[:, :, None], 3, axis=2)  # grayscale heat tile
        payload = codecs.encode_image(rgb, "pngz")
        out["x"].append(key >> 32)
        out["y"].append(key & 0xFFFFFFFF)
        out["n_points"].append(int(e - s))
        out["n_bytes"].append(len(payload))
        out["payload_md5"].append(hashlib.md5(payload).hexdigest())
        out["pixel_sum"].append(int(grid.sum(dtype=np.int64)) * 3)
    return pd.DataFrame(
        {
            "x": pd.Series(out["x"], dtype=np.int64),
            "y": pd.Series(out["y"], dtype=np.int64),
            "n_points": pd.Series(out["n_points"], dtype=np.int64),
            "n_bytes": pd.Series(out["n_bytes"], dtype=np.int64),
            "payload_md5": pd.Series(out["payload_md5"], dtype=object),
            "pixel_sum": pd.Series(out["pixel_sum"], dtype=np.int64),
        }
    )


def tile_raster_pipeline(sf_dir: str, z: int = 10, tile_px: int = 16) -> rd.Dataset:
    """Render every non-empty z-level tile as a pngz heat image; output
    one row of tile metadata per rendered tile (z, x, y, n_points,
    n_bytes, payload_md5, pixel_sum) — the md5 pins the encoded BYTES,
    so the oracle checks the full raster path end-to-end."""
    pts = points_from_documents(sf_dir)
    exploded = pts.map_batches(functools.partial(_explode_bins, z=z, tile_px=tile_px), batch_format="pyarrow")
    rendered = exploded.groupby("shard").map_groups(
        functools.partial(_render_shard, z=z, tile_px=tile_px), batch_format="pandas"
    )

    def add_z(t: pa.Table) -> pa.Table:
        return t.append_column("z", pa.array(np.full(t.num_rows, z, dtype=np.int64)))

    return rendered.map_batches(add_z, batch_format="pyarrow")
