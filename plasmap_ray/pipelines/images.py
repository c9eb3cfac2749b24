"""Image-payload pipelines: decode/verify fidelity, metadata stats,
phash dedup — over the driver-shaped images table
(image_id, bytes, w, h, fmt, caption, phash).

The images table is generated deterministically per scale factor
(fixtures.make_images) and cached as parquet under /tmp; the SAME file
backs the Ray pipelines and any DuckDB oracle query, so metadata-level
results are cross-checkable while decode-level checks (pixel fidelity)
are Ray-only + pytest.

Decode happens inside actor-pool batches on zero-copy Arrow buffers;
`bytes` is projected away before any shuffle (SURVEY.md §7.3 wide-binary
guidance).
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Count, Min, Sum

from .. import codecs, fixtures
from ..stages.common import safe_join

# images-per-scale policy: sized to keep test runtime sane while giving
# each sf a distinct volume (documents.parquet doesn't scale with sf).
IMAGES_PER_SF = {"sf0.001": 1_000, "sf0.01": 20_000, "sf0.1": 60_000}


def images_count_for(sf_dir: str) -> int:
    return IMAGES_PER_SF.get(os.path.basename(os.path.normpath(sf_dir)), 1_000)


def images_path_for(sf_dir: str) -> str:
    """Generate-once parquet for the sf-scaled images table."""
    return fixtures.images_parquet_path(images_count_for(sf_dir))


def read_images(sf_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    from ..sources.storage import read_image_table

    return read_image_table(images_path_for(sf_dir), columns=columns)


class FidelityVerify:
    """Actor-pool stage: decode every payload and verify the per-row
    invariants (driver input_hint): decoded pixels match the reference
    (byte-exact lossless / PSNR>=40 lossy), recomputed phash matches the
    phash column, caption non-empty.  Emits status columns; never
    raises on data errors (M9 error-router semantics — bad rows are
    flagged for quarantine, the task never fails)."""

    def __init__(self, check_reference: bool = True):
        self.check_reference = check_reference

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ok = np.zeros(n, dtype=bool)
        psnr = np.full(n, np.inf)
        err = np.full(n, "", dtype=object)
        w = batch["w"].to_numpy()
        h = batch["h"].to_numpy()
        ph = batch["phash"].to_numpy()
        fmts = batch["fmt"].to_pylist()
        ids = batch["image_id"].to_pylist()
        payloads = batch["bytes"].to_pylist()
        captions = batch["caption"].to_pylist()
        for i in range(n):
            try:
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                if codecs.phash64(px) != ph[i] and fmts[i] != "qnt8":
                    raise ValueError("phash mismatch")
                if self.check_reference:
                    ref = fixtures.reference_pixels(ids[i], int(w[i]), int(h[i]))
                    p = codecs.psnr_db(px, ref)
                    psnr[i] = p
                    if fmts[i] == "qnt8":
                        if p < 40.0:
                            raise ValueError(f"psnr {p:.2f} < 40")
                    elif not np.array_equal(px, ref):
                        raise ValueError("lossless pixels differ")
                if not captions[i]:
                    raise ValueError("empty caption")
                ok[i] = True
            except Exception as e:  # noqa: BLE001 — data errors routed, not raised
                err[i] = str(e)
        out = batch.drop_columns(["bytes"])
        out = out.append_column("ok", pa.array(ok, type=pa.bool_()))
        out = out.append_column("psnr_db", pa.array(np.where(np.isinf(psnr), 999.0, psnr), type=pa.float64()))
        return out.append_column("error", pa.array(err, type=pa.string()))


def fidelity_pipeline(sf_dir: str) -> rd.Dataset:
    """Decode + verify every image; returns per-format pass/fail counts.

    Oracle: the fixture generator GUARANTEES every row decodes clean
    (pixels byte-exact for lossless, PSNR>=40 for qnt8, caption
    non-empty), so the expected result is n_ok == n_images per format —
    the SQL mirror states that invariant and the driver's compare
    verifies the distributed decode+verify path reproduces it."""
    ds = read_images(sf_dir)
    verified = ds.map_batches(FidelityVerify, batch_format="pyarrow", batch_size=512, concurrency=(1, 8))
    out = verified.groupby("fmt").aggregate(
        Count(alias_name="n_images"),
        Sum("ok", alias_name="n_ok"),
    )

    import pyarrow.compute as pc

    def cast_ok(t: pa.Table) -> pa.Table:
        i = t.column_names.index("n_ok")
        return t.set_column(i, "n_ok", pc.cast(t["n_ok"], pa.int64()))

    return out.map_batches(cast_ok, batch_format="pyarrow")


def quarantine_split(sf_dir: str, out_dir: str) -> tuple[rd.Dataset, str]:
    """M9 error-router: verified-ok rows stream on; failed rows land in a
    quarantine parquet for re-run (failure-topic analogue,
    OsmPreprocessor.scala:54-93,96-99)."""
    ds = read_images(sf_dir)
    verified = ds.map_batches(
        FidelityVerify, batch_format="pyarrow", batch_size=512, concurrency=(1, 8)
    ).materialize()  # decode once; both filtered consumers reuse the blocks
    qdir = os.path.join(out_dir, "quarantine")
    verified.filter(expr="ok == False").write_parquet(qdir)
    good = verified.filter(expr="ok == True")
    return good, qdir


def image_meta_stats(sf_dir: str) -> rd.Dataset:
    """Metadata histogram: per (fmt, w, h) counts + payload bytes (SQL-
    checkable against the same parquet via DuckDB read_parquet)."""
    ds = read_images(sf_dir, columns=["fmt", "w", "h", "bytes"])

    import pyarrow.compute as pc

    def sizes(t: pa.Table) -> pa.Table:
        nbytes = pc.cast(pc.binary_length(t["bytes"]), pa.int64())
        return t.drop_columns(["bytes"]).append_column("payload_bytes", nbytes)

    return ds.map_batches(sizes, batch_format="pyarrow").groupby(["fmt", "w", "h"]).aggregate(
        Count(alias_name="n_images"), Sum("payload_bytes", alias_name="total_bytes")
    )


def phash_dedup(sf_dir: str) -> rd.Dataset:
    """Exact near-dup buckets by perceptual hash (D4): groups with >1
    image are the planted duplicate pairs."""
    ds = read_images(sf_dir, columns=["image_id", "phash"])
    g = ds.groupby("phash").aggregate(Min("image_id", alias_name="first_image_id"), Count(alias_name="n_images"))
    return g.filter(expr="n_images > 1")


def phash_near_dup_pairs(sf_dir: str, max_dist: int = 3) -> rd.Dataset:
    """Banded Hamming-LSH near-dup pairs over the phash column (D4+).
    ``max_dist=3`` (= bands-1) is the exact-recall regime; see
    dedup.hamming_pairs for the contract."""
    from . import dedup as _dedup

    ds = read_images(sf_dir, columns=["image_id", "phash"])
    return _dedup.hamming_pairs(ds, hash_col="phash", id_col="image_id", max_dist=max_dist)


def phash_quadrant_pairs(sf_dir: str, ds: rd.Dataset | None = None) -> rd.Dataset:
    """CROP-RESISTANT near-dup pairs (D4 extension): each image emits
    five perceptual hashes — its four quadrants plus the full frame —
    and two images pair whenever ANY of their slots hash-equal.  This
    catches quarter-crops (a crop's FULL hash equals the source's
    QUADRANT hash) that whole-image phash misses entirely, the standard
    crop-robust trick in image-dedup pipelines.

    Scale shape: decode + 5×phash in the actor pool (pixels never
    leave the stage, 5 hash rows per image shuffle); one hash-keyed
    groupby buckets candidates (bucket size = images sharing a slot
    hash — measured max 3 on the fixture corpus); per-bucket pair
    emission + one (pair)-keyed count reduce.  Output:
    (image_id_a, image_id_b, n_slot_matches), a < b.
    """
    if ds is None:
        ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])

    class QuadrantHashes:
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, slots, hashes = [], [], []
            w = batch["w"].to_numpy()
            h = batch["h"].to_numpy()
            fmts = batch["fmt"].to_pylist()
            payloads = batch["bytes"].to_pylist()
            im_ids = batch["image_id"].to_pylist()
            for i in range(batch.num_rows):
                px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                hh, ww = px.shape[:2]
                subs = (
                    px[: hh // 2, : ww // 2],
                    px[: hh // 2, ww // 2 :],
                    px[hh // 2 :, : ww // 2],
                    px[hh // 2 :, ww // 2 :],
                    px,
                )
                for s, sub in enumerate(subs):
                    ids.append(im_ids[i])
                    slots.append(s)
                    hashes.append(codecs.phash64(sub))
            return pa.table(
                {
                    "image_id": pa.array(ids, type=pa.string()),
                    "slot": pa.array(slots, type=pa.int64()),
                    "qhash": pa.array(hashes, type=pa.int64()),
                }
            )

    hashes = ds.map_batches(QuadrantHashes, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g["image_id"].to_pylist()
        a_l, b_l = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue  # two slots of the SAME image hash-equal
                a, b = sorted((ids[i], ids[j]))
                a_l.append(a)
                b_l.append(b)
        return pa.table(
            {
                "image_id_a": pa.array(a_l, type=pa.string()),
                "image_id_b": pa.array(b_l, type=pa.string()),
            }
        )

    pairs = hashes.groupby("qhash").map_groups(bucket_pairs, batch_format="pyarrow")
    return pairs.groupby(["image_id_a", "image_id_b"]).aggregate(Count(alias_name="n_slot_matches"))


def image_features(sf_dir: str) -> rd.Dataset:
    """Decode -> resize -> visual feature extraction (actor pool; ST5):
    per-image color/luminance/edge stats + recomputed phash."""
    from ..stages import media

    ds = read_images(sf_dir)
    feats = ds.map_batches(media.ImageFeatures, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))
    return feats.select_columns(["image_id", "fmt", "ok", "mean_r", "luminance", "edge_energy", "phash_recomputed"])


def caption_location_histogram(sf_dir: str) -> rd.Dataset:
    """Regex extraction over captions: pull the trailing 'in <place>'
    clause and histogram places (M-family string ops; because captions
    embed the ground-truth containing district, this doubles as a
    cheap text-side check of the spatial join)."""
    import pyarrow.compute as pc

    ds = read_images(sf_dir, columns=["caption"])

    def extract(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["caption"], r" in (?P<place>.+)$")
        place = pc.struct_field(m, "place")
        return pa.table({"place": place})

    return ds.map_batches(extract, batch_format="pyarrow").groupby("place").aggregate(Count(alias_name="n_images"))


def zone_top_terms(sf_dir: str, k: int = 5) -> rd.Dataset:
    """Regional vocabulary: the top-k caption tokens per admin zone —
    the geo x text cross-family query behind per-region prompt/label
    audits (what does the corpus SAY about each place?).  PiP-assign
    every image to its containing zones, tokenize captions with the
    canonical single-space-lowercase split (pipelines.index contract),
    count per (zone, token), keep the k most frequent per zone with
    (count desc, token asc) deterministic ordering.

    Scale shape: the broadcast boundary index rides the actor pool;
    tokens are counted map-side per batch (a (zone, token, n) combiner)
    so the shuffle carries distinct-key partials, never per-image
    rows; the per-zone top-k reduce is bounded by the zone count.

    Output: (rel_id, token, n, rank), rank in [1, k].
    """
    import pyarrow.compute as pc

    from ..pipelines.spatial import boundary_index_ref
    from ..stages import geo

    idx_ref = boundary_index_ref()
    ds = read_images(sf_dir, columns=["image_id", "caption"])

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        return pa.table(
            {
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "caption": t["caption"],
            }
        )

    joined = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("caption",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )

    def count_partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.utf8_lower(t["caption"]), " ")
        lens = pc.list_value_length(toks).to_numpy().astype(np.int64)
        rel = np.repeat(t["rel_id"].to_numpy(), lens)
        flat = pa.table({"rel_id": pa.array(rel, type=pa.int64()), "token": pc.list_flatten(toks)})
        return (
            flat.group_by(["rel_id", "token"])
            .aggregate([("token", "count")])
            .rename_columns(["rel_id", "token", "n"])
        )

    counts = (
        joined.map_batches(count_partial, batch_format="pyarrow")
        .groupby(["rel_id", "token"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def topk(g, k=k):
        g = g.sort_values(["n", "token"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return counts.groupby("rel_id").map_groups(topk, batch_format="pandas")


MOSAIC_Z = 10


def best_image_per_tile(sf_dir: str, z: int = MOSAIC_Z, parts: int = 32) -> rd.Dataset:
    """Mosaic selection: the single best image per slippy tile, ranked
    by payload size (bitrate proxy) with image_id as the deterministic
    tiebreak — the representative-picker a tiled image-map serves from.

    Scale shape: a per-batch argmax combiner collapses each batch to
    ≤1 row per tile BEFORE the shuffle (the tile_count_partial
    discipline), so the groupby moves tiles×batches rows, never images;
    the final reduce is a coarse-partition run-scan (one task per
    ``tile_key % parts`` slice), not one task per tile.  ``bytes`` is
    reduced to its length map-side and never shuffles.
    """
    import pyarrow.compute as pc

    from .. import tiles

    ds = read_images(sf_dir, columns=["image_id", "bytes"])

    def argmax_runs(t: pa.Table) -> pa.Table:
        """First row per (x, y) after (payload DESC, image_id ASC) sort."""
        t = t.sort_by(
            [
                ("x", "ascending"),
                ("y", "ascending"),
                ("payload_bytes", "descending"),
                ("image_id", "ascending"),
            ]
        )
        key = t["x"].to_numpy() * (1 << z) + t["y"].to_numpy()
        if len(key) == 0:
            return t
        starts = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1])
        return t.take(pa.array(starts))

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        x, y = tiles.tile_xy(lon, lat, z)
        nb = pc.cast(pc.binary_length(t["bytes"]), pa.int64())
        tbl = pa.table(
            {
                "image_id": t["image_id"],
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
                "payload_bytes": nb,
            }
        )
        tbl = argmax_runs(tbl)  # map-side combiner
        part = (tbl["x"].to_numpy() * (1 << z) + tbl["y"].to_numpy()) % parts
        return tbl.append_column("part", pa.array(part, type=pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        g = argmax_runs(g.drop_columns(["part"]))
        zc = pa.array(np.full(g.num_rows, z, dtype=np.int64), type=pa.int64())
        return pa.table(
            {
                "z": zc,
                "x": g["x"],
                "y": g["y"],
                "image_id": g["image_id"],
                "payload_bytes": g["payload_bytes"],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
    )


def zone_image_stats(sf_dir: str) -> rd.Dataset:
    """Per-admin-zone image inventory: count + payload volume of the
    images geolocated inside each boundary polygon (the capacity-
    planning view of the image corpus, and the cross-modal PiP join
    over the IMAGE table rather than documents).

    Broadcast boundary index (ray.put once, probed in the actor pool);
    ``bytes`` is reduced to its length BEFORE the join so the shuffle
    to the per-zone aggregate carries int64s only.
    Output: (rel_id, admin_level, n_images, total_bytes).
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Count as _Count

    from ..pipelines.spatial import boundary_index_ref
    from ..stages import geo

    idx_ref = boundary_index_ref()
    ds = read_images(sf_dir, columns=["image_id", "bytes"])

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        return pa.table(
            {
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "payload_bytes": pc.cast(pc.binary_length(t["bytes"]), pa.int64()),
            }
        )

    joined = ds.map_batches(prep, batch_format="pyarrow").map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("payload_bytes",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )
    return (
        joined.select_columns(["rel_id", "admin_level", "payload_bytes"])
        .groupby(["rel_id", "admin_level"])
        .aggregate(_Count(alias_name="n_images"), Sum("payload_bytes", alias_name="total_bytes"))
    )


class ThumbnailStage:
    """Actor-pool stage: decode -> nearest-neighbor resize -> re-encode
    (pngz) — the standard multimodal preprocessing step (thumbnail /
    resolution normalization) with deterministic output bytes, so the
    thumbnail payload md5 is oracle-checkable.  The large ``bytes``
    column is consumed HERE and only the (small) thumbnail metadata
    leaves the stage."""

    def __init__(self, side: int = 8):
        from .. import codecs

        self.side = side
        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from ..stages.media import resize_nearest

        ids, md5s, nbytes, means = [], [], [], []
        for i in range(batch.num_rows):
            fmt = batch["fmt"][i].as_py()
            w = batch["w"][i].as_py()
            h = batch["h"][i].as_py()
            px = self.codecs.decode_image(batch["bytes"][i].as_py(), w, h, fmt)
            thumb = resize_nearest(px, self.side, self.side)
            payload = self.codecs.encode_image(thumb, "pngz")
            ids.append(batch["image_id"][i].as_py())
            md5s.append(hashlib.md5(payload).hexdigest())
            nbytes.append(len(payload))
            means.append(round(float(thumb.mean()), 4))
        return pa.table(
            {
                "image_id": pa.array(ids, type=pa.string()),
                "thumb_md5": pa.array(md5s, type=pa.string()),
                "thumb_bytes": pa.array(nbytes, type=pa.int64()),
                "thumb_mean": pa.array(means, type=pa.float64()),
            }
        )


def image_thumbnails(sf_dir: str, side: int = 8) -> rd.Dataset:
    """Thumbnail pipeline over the images table (decode/resize/encode in
    an actor pool; output = metadata only, payload bytes never shuffle)."""
    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(
        ThumbnailStage, fn_constructor_kwargs=dict(side=side), batch_format="pyarrow", batch_size=512, concurrency=(1, 8)
    )


# ---------------------------------------------------------------------------
# geo_inconsistent_dups (same phash, far-apart locations — dataset QA)
# ---------------------------------------------------------------------------

GEO_DUP_SHARDS = 32
# planar-degree fixed-point threshold (0.2 deg) on trajectory.FP_SCALE
GEO_DUP_THRESH_FP = 200_000_000


def geo_inconsistent_dups(sf_dir: str, thresh_fp: int = GEO_DUP_THRESH_FP) -> rd.Dataset:
    """Duplicate-image geo-consistency audit: pairs of images with the
    SAME phash whose recorded positions are far apart — the classic
    web-scrape poisoning signature (one stock photo geo-tagged in many
    cities) a training-data pipeline flags before sampling.

    Shuffle shape: ONE hash shuffle on ``phash % shards`` (exact-bucket
    discipline of ``phash_dedup``), then a single sort + run scan per
    shard emits each unordered same-phash pair once (`dedup.
    pairs_in_key_runs` — bounded memory, no per-bucket dispatch).
    Distances are fixed-point int64 (floor(sqrt(d2)·1e9 + 0.5), the
    trajectory _seg_fp contract) so the threshold compare is exact and
    the SQL oracle mirrors it bit-for-bit.

    Output: (img_a, img_b, phash, dist_fp) for pairs at or beyond
    ``thresh_fp``, img_a < img_b (numeric image ids).
    """
    import pyarrow.compute as pc

    from .dedup import pairs_in_key_runs
    from .trajectory import FP_SCALE

    ds = read_images(sf_dir, columns=["image_id", "phash"])

    def prep(t: pa.Table) -> pa.Table:
        img_id = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64())
        ph = t["phash"].to_numpy()
        return pa.table(
            {
                "img_id": img_id,
                "phash": t["phash"],
                "shard": pa.array(ph % GEO_DUP_SHARDS, type=pa.int64()),
            }
        )

    def shard_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["img_id"].to_numpy()
        ph = g["phash"].to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)

        def verify(i, j):
            dlon = lon[i] - lon[j]
            dlat = lat[i] - lat[j]
            return np.floor(np.sqrt(dlon * dlon + dlat * dlat) * FP_SCALE + 0.5).astype(np.int64)

        ia, ib, d = pairs_in_key_runs(ph, ids, verify)
        keep = d >= thresh_fp
        return pd.DataFrame(
            {
                "img_a": ids[ia[keep]],
                "img_b": ids[ib[keep]],
                "phash": ph[ia[keep]],
                "dist_fp": d[keep].astype(np.int64),
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(shard_pairs, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# caption_spam (one caption, many distinct images — boilerplate detection)
# ---------------------------------------------------------------------------

CAPTION_SPAM_MIN_PHASHES = 10


def caption_spam(sf_dir: str, min_phashes: int = CAPTION_SPAM_MIN_PHASHES) -> rd.Dataset:
    """Boilerplate-caption audit: captions attached to at least
    ``min_phashes`` DISTINCT images (by phash) — the alt-text spam /
    template-caption signature a caption-training pipeline filters
    before contrastive training (complement of
    :func:`geo_inconsistent_dups`: there one image spans many places,
    here one caption spans many images).

    Shuffle shape: map-side (caption, phash) pair combiner → groupby
    the pair (distinct) → groupby caption — both exchanges carry only
    key + int64 count rows, bounded by the distinct-pair space, never
    image payloads.

    Output: (caption, n_images, n_phashes), n_phashes ≥ min_phashes.
    """
    ds = read_images(sf_dir, columns=["caption", "phash"])

    def pair_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"caption": t["caption"].to_pylist(), "phash": t["phash"].to_numpy()})
        g = df.groupby(["caption", "phash"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "caption": pa.array(g["caption"], type=pa.string()),
                "phash": pa.array(g["phash"], type=pa.int64()),
                "n": pa.array(g["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby(["caption", "phash"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def one(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "caption": t["caption"],
                "n": t["n"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), type=pa.int64()),
            }
        )

    per_caption = (
        pairs.map_batches(one, batch_format="pyarrow")
        .groupby("caption")
        .aggregate(Sum("n", alias_name="n_images"), Sum("one", alias_name="n_phashes"))
    )
    return per_caption.filter(expr=f"n_phashes >= {min_phashes}")


# ---------------------------------------------------------------------------
# shard_manifest (training-shard packing with spatial locality)
# ---------------------------------------------------------------------------

SHARD_Z = 10  # shard key: slippy tile (spatial locality for training reads)
SHARD_BYTES = 262_144  # byte budget per sub-shard window (256 KiB)
_SHARD_PACK = np.int64(1) << np.int64(32)


def shard_manifest(sf_dir: str, z: int = SHARD_Z, shard_bytes: int = SHARD_BYTES, parts: int = 32) -> rd.Dataset:
    """WebDataset-style packing manifest: assign every image to a
    spatially-local training shard (its z10 slippy tile), order
    deterministically by image_id within the tile, and emit each
    payload's byte OFFSET plus its budgeted sub-shard index
    (cum_bytes // shard_bytes — fixed byte windows over the tile
    stream).  A training job reads one shard sequentially and gets
    spatially-coherent samples; the manifest is all a packer needs to
    lay the bytes out.

    Scale shape: ``bytes`` reduces to its LENGTH map-side (the payload
    never shuffles); the per-tile regroup is the coarse-partition
    run-scan (tile-key % parts — one task per slice, cumsums reset at
    tile boundaries), so manifest construction shuffles only
    (image_id, tile, nbytes) rows.

    Output: (x, y, image_id, shard_seq, byte_offset, nbytes).
    """
    import pyarrow.compute as pc

    from .. import tiles

    ds = read_images(sf_dir, columns=["image_id", "bytes"])

    def prep(t: pa.Table) -> pa.Table:
        img_id = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        lon, lat = fixtures.derive_lon(img_id), fixtures.derive_lat(img_id)
        x, y = tiles.tile_xy(lon, lat, z)
        key = x.astype(np.int64) * _SHARD_PACK + y.astype(np.int64)
        return pa.table(
            {
                "image_id": t["image_id"],
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
                "nbytes": pc.cast(pc.binary_length(t["bytes"]), pa.int64()),
                "part": pa.array(key % parts, type=pa.int64()),
            }
        )

    empty = pa.table(
        {
            "x": pa.array([], type=pa.int64()),
            "y": pa.array([], type=pa.int64()),
            "image_id": pa.array([], type=pa.string()),
            "shard_seq": pa.array([], type=pa.int64()),
            "byte_offset": pa.array([], type=pa.int64()),
            "nbytes": pa.array([], type=pa.int64()),
        }
    )

    def pack(g: pa.Table) -> pa.Table:
        g = g.sort_by([("x", "ascending"), ("y", "ascending"), ("image_id", "ascending")])
        if g.num_rows == 0:
            return empty
        x = g["x"].to_numpy()
        y = g["y"].to_numpy()
        nb = g["nbytes"].to_numpy()
        key = x * _SHARD_PACK + y
        # cumulative bytes BEFORE each row, reset at tile boundaries
        cum = np.concatenate([[0], np.cumsum(nb)[:-1]])
        starts = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1])
        base = np.repeat(cum[starts], np.diff(np.concatenate([starts, [len(key)]])))
        off = cum - base
        return pa.table(
            {
                "x": g["x"],
                "y": g["y"],
                "image_id": g["image_id"],
                "shard_seq": pa.array(off // shard_bytes, type=pa.int64()),
                "byte_offset": pa.array(off, type=pa.int64()),
                "nbytes": g["nbytes"],
            }
        )

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pack, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# phash pair pixel verification (dedup -> fidelity loop closure)
# ---------------------------------------------------------------------------


def phash_pixel_verify(sf_dir: str, psnr_min: float = 40.0) -> rd.Dataset:
    """Pixel-level verification of phash near-dup CANDIDATES: the
    north-rule per-row fidelity invariant (decoded-pixel equality /
    PSNR>=40 for lossy codecs) applied at PAIR level, closing the
    dedup loop — a phash match is a hypothesis, the decode is the
    proof (a training pipeline drops only verified duplicates).

    Shape: one cheap metadata pass finds candidate phashes (buckets
    with >1 image — bounded: planted dups + hash collisions, NOT
    corpus-sized); payloads re-attach via a predicate-pushdown read of
    ONLY those buckets (`bytes` for non-candidates never leaves
    storage); one phash-keyed exchange co-locates each bucket, whose
    group task decodes (ST5 actor path) and emits every unordered pair
    with its integer SSE, PSNR and verdict.  PSNR uses the exact
    integer sum-of-squares (codecs.psnr_db), so engine and golden agree
    bit-for-bit.

    Output: (img_a, img_b, phash, sse, psnr_db, verified), img_a<img_b.
    """
    from .. import codecs as _codecs
    from ..stages.common import duckdb_round as _dr

    meta = read_images(sf_dir, columns=["image_id", "phash"])
    cand = (
        meta.groupby("phash")
        .aggregate(Count(alias_name="n"))
        .filter(expr="n > 1")
        .to_pandas()
    )
    if len(cand) == 0:
        return pa.table({
            "img_a": pa.array([], type=pa.int64()), "img_b": pa.array([], type=pa.int64()),
            "phash": pa.array([], type=pa.int64()), "sse": pa.array([], type=pa.int64()),
            "psnr_db": pa.array([], type=pa.float64()), "verified": pa.array([], type=pa.bool_()),
        })
    phashes = sorted(int(p) for p in cand["phash"])

    import pyarrow.compute as pc

    full = rd.read_parquet(
        images_path_for(sf_dir),
        columns=["image_id", "bytes", "w", "h", "fmt", "phash"],
        filter=pc.field("phash").isin(phashes),
    )

    def verify_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_nid=g["image_id"].str.slice(4).astype(np.int64)).sort_values("_nid")
        ids = g["_nid"].to_numpy()
        pix = [
            _codecs.decode_image(b, int(w), int(h), f)
            for b, w, h, f in zip(g["bytes"], g["w"], g["h"], g["fmt"])
        ]
        ph = int(g["phash"].iloc[0])
        rows = {"img_a": [], "img_b": [], "phash": [], "sse": [], "psnr_db": [], "verified": []}
        for a in range(len(ids)):
            for b in range(a + 1, len(ids)):
                if pix[a].shape != pix[b].shape:
                    sse, db = -1, float("-inf")
                else:
                    d = pix[a].astype(np.int64) - pix[b].astype(np.int64)
                    sse = int((d * d).sum())
                    db = _codecs.psnr_db(pix[a], pix[b])
                rows["img_a"].append(int(ids[a]))
                rows["img_b"].append(int(ids[b]))
                rows["phash"].append(ph)
                rows["sse"].append(sse)
                rows["psnr_db"].append(float(_dr(np.array([db]), 4)[0]) if np.isfinite(db) else db)
                rows["verified"].append(bool(db >= psnr_min))
        return pd.DataFrame(rows)

    return full.groupby("phash").map_groups(verify_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# tile montage (rendered per-tile contact sheet — the visual mosaic layer)
# ---------------------------------------------------------------------------

MONTAGE_K = 4  # 2x2 grid
MONTAGE_SIDE = 8  # thumbnail side (px)


def _topk_runs(t: pa.Table, z: int, k: int) -> pa.Table:
    """Top-k rows per (x, y) after (payload DESC, image_id ASC) sort —
    the argmax_runs combiner generalized to k survivors per run."""
    t = t.sort_by(
        [("x", "ascending"), ("y", "ascending"), ("payload_bytes", "descending"), ("image_id", "ascending")]
    )
    key = t["x"].to_numpy() * (1 << z) + t["y"].to_numpy()
    if len(key) == 0:
        return t
    starts = np.concatenate([[0], np.nonzero(np.diff(key))[0] + 1])
    rank = np.arange(len(key)) - np.repeat(starts, np.diff(np.concatenate([starts, [len(key)]])))
    return t.take(pa.array(np.nonzero(rank < k)[0]))


def tile_montage(
    sf_dir: str, z: int = MOSAIC_Z, k: int = MONTAGE_K, side: int = MONTAGE_SIDE, parts: int = 32
) -> rd.Dataset:
    """Rendered per-tile contact sheet: the top-``k`` images of each
    slippy tile (payload-size rank, image_id tiebreak — the
    best_image_per_tile ordering) decoded, NN-resized to
    ``side``x``side`` and composed row-major into a sqrt(k)-square RGB
    montage; emitted as (z, x, y, n_slots, montage_md5) with the md5
    over the raw RGB buffer (rendering is bit-deterministic, so the
    hash IS the image).  Empty slots stay zero (black).

    Scale shape: selection runs on metadata only (per-batch top-k
    combiner -> tile-sharded run-scan; ``bytes`` reduced to its length
    map-side); the SELECTED ids (<= k x tiles, output-bounded) re-attach
    payloads via a predicate-pushdown read, so non-selected payloads
    never leave storage; decode+compose runs per tile group (<= k
    images each).
    """
    import hashlib

    import pyarrow.compute as pc

    from .. import codecs as _codecs
    from .. import tiles
    from ..stages.media import resize_nearest

    ds = read_images(sf_dir, columns=["image_id", "bytes"])

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        lon, lat = fixtures.derive_lon(ids), fixtures.derive_lat(ids)
        x, y = tiles.tile_xy(lon, lat, z)
        nb = pc.cast(pc.binary_length(t["bytes"]), pa.int64())
        tbl = pa.table(
            {
                "image_id": t["image_id"],
                "x": pa.array(x, type=pa.int64()),
                "y": pa.array(y, type=pa.int64()),
                "payload_bytes": nb,
            }
        )
        tbl = _topk_runs(tbl, z, k)  # map-side combiner
        part = (tbl["x"].to_numpy() * (1 << z) + tbl["y"].to_numpy()) % parts
        return tbl.append_column("part", pa.array(part, type=pa.int64()))

    def reduce_part(g: pa.Table) -> pa.Table:
        return _topk_runs(g.drop_columns(["part"]), z, k)

    selected = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reduce_part, batch_format="pyarrow")
        .to_pandas()  # output-bounded: <= k rows per occupied tile
    )
    sel_ids = sorted(selected["image_id"])
    rank_of = {r.image_id: (int(r.x), int(r.y)) for r in selected.itertuples()}

    full = rd.read_parquet(
        images_path_for(sf_dir),
        columns=["image_id", "bytes", "w", "h", "fmt"],
        filter=pc.field("image_id").isin(sel_ids),
    )

    def attach_tile(t: pa.Table) -> pa.Table:
        xs = np.array([rank_of[i][0] for i in t["image_id"].to_pylist()], dtype=np.int64)
        ys = np.array([rank_of[i][1] for i in t["image_id"].to_pylist()], dtype=np.int64)
        return t.append_column("x", pa.array(xs)).append_column("y", pa.array(ys))

    g_side = int(np.ceil(np.sqrt(k)))

    def montage(gdf: pd.DataFrame) -> pd.DataFrame:
        nb = gdf["bytes"].map(len).astype(np.int64)
        gdf = gdf.assign(_nb=nb).sort_values(["_nb", "image_id"], ascending=[False, True])
        canvas = np.zeros((g_side * side, g_side * side, 3), dtype=np.uint8)
        n = 0
        for _, r in gdf.head(k).iterrows():
            px = _codecs.decode_image(r["bytes"], int(r["w"]), int(r["h"]), r["fmt"])
            thumb = resize_nearest(px, side, side)
            ry, rx = divmod(n, g_side)
            canvas[ry * side : (ry + 1) * side, rx * side : (rx + 1) * side] = thumb
            n += 1
        return pd.DataFrame(
            {
                "z": [z],
                "x": [int(gdf["x"].iloc[0])],
                "y": [int(gdf["y"].iloc[0])],
                "n_slots": [n],
                "montage_md5": [hashlib.md5(canvas.tobytes()).hexdigest()],
            }
        )

    return full.map_batches(attach_tile, batch_format="pyarrow").groupby(["x", "y"]).map_groups(
        montage, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# zone_color_signature (decoded-pixel color statistics per admin zone)
# ---------------------------------------------------------------------------


class ColorSumStage:
    """Actor-pool stage (ST5): decode every payload and reduce it to
    exact int64 per-channel pixel sums — the ``bytes`` column is
    consumed HERE; only five integers per image leave the stage."""

    def __init__(self):
        from .. import codecs

        self.codecs = codecs

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        sums = np.zeros((n, 3), dtype=np.int64)
        npix = np.zeros(n, dtype=np.int64)
        for i in range(n):
            px = self.codecs.decode_image(
                batch["bytes"][i].as_py(), batch["w"][i].as_py(), batch["h"][i].as_py(), batch["fmt"][i].as_py()
            )
            sums[i] = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            npix[i] = px.shape[0] * px.shape[1]
        ids = pc.cast(pc.utf8_slice_codeunits(batch["image_id"], 4, 16), pa.int64()).to_numpy()
        return pa.table(
            {
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "n_pixels": pa.array(npix),
                "sum_r": pa.array(sums[:, 0]),
                "sum_g": pa.array(sums[:, 1]),
                "sum_b": pa.array(sums[:, 2]),
            }
        )


def zone_color_signature(sf_dir: str) -> rd.Dataset:
    """Per-admin-zone color signature: mean decoded R/G/B over every
    pixel of every image geolocated in the zone — the geo x pixel
    aggregate (the flagship's decode + PiP + reduce shape, producing a
    visual-content statistic instead of counts; regional style/sensor
    drift shows up here first).

    Exactness: per-image channel sums are int64 (uint8 pixels), the
    zone reduce is integer, and the three means are one mirrored
    division each (golden oracle recomputes locally, rect-rule zone
    assignment == the PiP actor on the rect fixture zones).
    Output: (rel_id, admin_level, n_images, n_pixels, mean_r/g/b).
    """
    from ray.data.aggregate import Count as _Count

    from ..pipelines.spatial import boundary_index_ref
    from ..stages import geo

    idx_ref = boundary_index_ref()
    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])

    sums = ds.map_batches(ColorSumStage, batch_format="pyarrow", batch_size=512, concurrency=(1, 8))
    joined = sums.map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("n_pixels", "sum_r", "sum_g", "sum_b")),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    )
    agg = (
        joined.select_columns(["rel_id", "admin_level", "n_pixels", "sum_r", "sum_g", "sum_b"])
        .groupby(["rel_id", "admin_level"])
        .aggregate(
            _Count(alias_name="n_images"),
            Sum("n_pixels", alias_name="n_pixels"),
            Sum("sum_r", alias_name="sum_r"),
            Sum("sum_g", alias_name="sum_g"),
            Sum("sum_b", alias_name="sum_b"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..stages.common import duckdb_round as _dr

        npx = t["n_pixels"].to_numpy().astype(np.float64)
        out = {
            "rel_id": pc.cast(t["rel_id"], pa.int64()),
            "admin_level": pc.cast(t["admin_level"], pa.int64()),
            "n_images": pc.cast(t["n_images"], pa.int64()),
            "n_pixels": pc.cast(t["n_pixels"], pa.int64()),
        }
        for ch in ("r", "g", "b"):
            out[f"mean_{ch}"] = pa.array(
                _dr(t[f"sum_{ch}"].to_numpy().astype(np.float64) / npx, 4), type=pa.float64()
            )
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# image_format_migration (storage-format rewrite with verification)
# ---------------------------------------------------------------------------


class FormatMigrate:
    """Actor-pool stage: decode -> re-encode to the target codec at FULL
    resolution -> verify the round trip — the storage-migration rewrite
    (raw/qnt8 -> pngz lossless) every long-lived corpus eventually runs.
    ``bytes`` is consumed and REPLACED in-stage; only metadata +
    verification leave (the migrated payload would stream to the
    partitioned writer in production — here its md5 pins determinism)."""

    def __init__(self, target_fmt: str = "pngz"):
        from .. import codecs

        self.codecs = codecs
        self.target = target_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        n = batch.num_rows
        old_b = np.empty(n, dtype=np.int64)
        new_b = np.empty(n, dtype=np.int64)
        lossless = np.zeros(n, dtype=bool)
        psnr = np.full(n, np.inf)
        md5s = []
        for i in range(n):
            payload = batch["bytes"][i].as_py()
            px = self.codecs.decode_image(
                payload, batch["w"][i].as_py(), batch["h"][i].as_py(), batch["fmt"][i].as_py()
            )
            out = self.codecs.encode_image(px, self.target)
            back = self.codecs.decode_image(out, px.shape[1], px.shape[0], self.target)
            old_b[i] = len(payload)
            new_b[i] = len(out)
            lossless[i] = bool(np.array_equal(px, back))
            psnr[i] = self.codecs.psnr_db(px, back)
            md5s.append(hashlib.md5(out).hexdigest())
        return pa.table(
            {
                "image_id": batch["image_id"],
                "fmt": batch["fmt"],
                "old_bytes": pa.array(old_b),
                "new_bytes": pa.array(new_b),
                "lossless": pa.array(lossless, type=pa.bool_()),
                "psnr_db": pa.array(psnr, type=pa.float64()),
                "new_md5": pa.array(md5s, type=pa.string()),
            }
        )


def image_format_migration(sf_dir: str, target_fmt: str = "pngz") -> rd.Dataset:
    """Per-source-format migration report: counts, byte totals before/
    after, and the round-trip-lossless guarantee for the re-encode of
    the whole corpus to ``target_fmt``.  Map-only (decode+re-encode in
    the actor pool); the reduce carries five integers per format.
    Output: (fmt, n_images, old_bytes, new_bytes, n_lossless).
    """
    from ray.data.aggregate import Count as _Count

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    migrated = ds.map_batches(
        FormatMigrate, fn_constructor_kwargs=dict(target_fmt=target_fmt),
        batch_format="pyarrow", batch_size=512, concurrency=(1, 8),
    )

    def ints(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "fmt": t["fmt"],
                "old_bytes": t["old_bytes"],
                "new_bytes": t["new_bytes"],
                "is_lossless": pc.cast(t["lossless"], pa.int64()),
            }
        )

    return (
        migrated.map_batches(ints, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            _Count(alias_name="n_images"),
            Sum("old_bytes", alias_name="old_bytes"),
            Sum("new_bytes", alias_name="new_bytes"),
            Sum("is_lossless", alias_name="n_lossless"),
        )
        .sort("fmt")
    )


def image_lossy_migration(sf_dir: str, target_fmt: str = "dctq") -> rd.Dataset:
    """Migration of the whole corpus to the LOSSY ``dctq`` transform
    codec (8x8 DCT + frequency-weighted quantization, codecs.py) with
    the PSNR >= 40 dB fidelity gate verified per row — the
    quality-bounded recompression run (JPEG-shaped) a storage team
    applies to a cold corpus.

    Oracle: ``dctq``'s quantization table PROVES worst-case pixel MSE
    stays under the 40 dB gate (codecs._DCTQ_STEPS), so every row must
    pass — the SQL mirror states the invariant (n_psnr40 == n_images
    per source format) and the driver compare verifies the distributed
    decode -> DCT -> quantize -> decode -> PSNR path reproduces it.

    Output: (fmt, n_images, n_psnr40).
    """
    from ray.data.aggregate import Count as _Count

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    migrated = ds.map_batches(
        FormatMigrate, fn_constructor_kwargs=dict(target_fmt=target_fmt),
        batch_format="pyarrow", batch_size=512, concurrency=(1, 8),
    )

    def gate(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ok = pc.or_(t["lossless"], pc.greater_equal(t["psnr_db"], pa.scalar(40.0)))
        return pa.table({"fmt": t["fmt"], "psnr_ok": pc.cast(ok, pa.int64())})

    return (
        migrated.map_batches(gate, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            _Count(alias_name="n_images"),
            Sum("psnr_ok", alias_name="n_psnr40"),
        )
        .sort("fmt")
    )


# ---------------------------------------------------------------------------
# Deterministic augmentation (flip / rotate) with checksum verification
# ---------------------------------------------------------------------------

AUG_NAMES = ("identity", "hflip", "rot90", "rot180")


def augment_pixels(px: np.ndarray, aug: int) -> np.ndarray:
    """Apply the aug-th deterministic geometric augmentation to an
    (h, w, 3) uint8 array.  0=identity, 1=horizontal flip, 2=rot90
    counter-clockwise (swaps dims), 3=rot180.  Pure NumPy views +
    one contiguous copy — the cheapest possible per-image kernel."""
    if aug == 0:
        return px
    if aug == 1:
        return np.ascontiguousarray(px[:, ::-1])
    if aug == 2:
        return np.ascontiguousarray(np.rot90(px))
    if aug == 3:
        return np.ascontiguousarray(px[::-1, ::-1])
    raise ValueError(f"unknown aug {aug}")


def _augment_table(batch: pa.Table) -> pa.Table:
    """Decode → augment (choice keyed by image_id % 4, so the plan is
    reproducible under any repartitioning) → checksum the augmented
    pixel buffer.  ``bytes`` never leaves the task."""
    import zlib

    n = batch.num_rows
    w = batch["w"].to_numpy()
    h = batch["h"].to_numpy()
    ids = batch["image_id"].to_pylist()
    fmts = batch["fmt"].to_pylist()
    payloads = batch["bytes"].to_pylist()
    aug_id = np.zeros(n, dtype=np.int64)
    out_w = np.zeros(n, dtype=np.int64)
    out_h = np.zeros(n, dtype=np.int64)
    crc = np.zeros(n, dtype=np.int64)
    ok = np.zeros(n, dtype=bool)
    for i in range(n):
        try:
            a = int(ids[i].rsplit("-", 1)[-1]) % 4 if isinstance(ids[i], str) else int(ids[i]) % 4
            px = codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
            apx = augment_pixels(px, a)
            aug_id[i] = a
            out_h[i], out_w[i] = apx.shape[0], apx.shape[1]
            crc[i] = zlib.crc32(apx.tobytes())
            ok[i] = True
        except Exception:  # noqa: BLE001 — M9: flag, don't fail the task
            pass
    return pa.table(
        {
            "image_id": batch["image_id"],
            "aug": pa.array([AUG_NAMES[a] for a in aug_id], type=pa.string()),
            "out_w": pa.array(out_w, type=pa.int64()),
            "out_h": pa.array(out_h, type=pa.int64()),
            "pix_crc": pa.array(crc, type=pa.int64()),
            "ok": pa.array(ok),
        }
    )


def image_augment(sf_dir: str) -> rd.Dataset:
    """Deterministic geometric augmentation pass over the images table
    — the dataset-expansion stage of an image training pipeline, made
    verifiable: each image gets the augmentation keyed by its id, and
    the output carries the CRC32 of the augmented pixel buffer plus the
    (possibly swapped) output dims, so the golden oracle pins every
    byte of every augmented image without shipping pixels anywhere.

    Scale shape: map-ONLY (decode + flip + checksum fused in one
    stage); `bytes` is projected away before results leave the task.
    Output: (image_id, aug, out_w, out_h, pix_crc, ok).
    """
    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(_augment_table, batch_format="pyarrow", batch_size=512)


def aspect_buckets(sf_dir: str) -> rd.Dataset:
    """Aspect-ratio bucketing over image METADATA only — the batch-
    composition pass of aspect-bucketed training (group images whose
    shapes batch together without letterboxing).  Buckets by exact
    integer cross-multiplication (no float aspect): wide if 3w ≥ 4h,
    tall if 3h ≥ 4w, else square-ish.

    Scale shape: reads only (w, h, fmt) columns — the multi-GB bytes
    column never leaves storage (the prune-at-the-read rule); one
    (bucket, fmt)-bounded count groupby.
    Output: (bucket, fmt, n_images, total_px).
    """
    ds = read_images(sf_dir, columns=["w", "h", "fmt"])

    def bucketize(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy().astype(np.int64)
        h = t["h"].to_numpy().astype(np.int64)
        bucket = np.where(3 * w >= 4 * h, "wide", np.where(3 * h >= 4 * w, "tall", "squarish"))
        return pa.table(
            {
                "bucket": pa.array(bucket, type=pa.string()),
                "fmt": t["fmt"],
                "px": pa.array(w * h, type=pa.int64()),
            }
        )

    return (
        ds.map_batches(bucketize, batch_format="pyarrow")
        .groupby(["bucket", "fmt"])
        .aggregate(Count(alias_name="n_images"), Sum("px", alias_name="total_px"))
        .sort(["bucket", "fmt"])
    )


def compression_stats(sf_dir: str) -> rd.Dataset:
    """Per-format storage efficiency: payload bytes vs raw RGB bytes
    and their ratio — the codec-selection report behind
    image_format_migration (which format earns its decode cost?).

    Scale shape: reads (fmt, w, h, bytes) and collapses each batch to
    per-format int64 sums map-side (binary_length only — payloads are
    never decoded); one format-bounded groupby; the ratio is a single
    mirrored division.  Output: (fmt, n_images, payload_bytes,
    raw_bytes, ratio).
    """
    import pyarrow.compute as pc

    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["fmt", "w", "h", "bytes"])

    def partial(t: pa.Table) -> pa.Table:
        pb = pc.cast(pc.binary_length(t["bytes"]), pa.int64()).to_numpy()
        raw = 3 * t["w"].to_numpy().astype(np.int64) * t["h"].to_numpy().astype(np.int64)
        fmt = t["fmt"].to_numpy(zero_copy_only=False)
        order = np.argsort(fmt, kind="stable")
        fmt, pb, raw = fmt[order], pb[order], raw[order]
        starts = np.concatenate([[0], np.nonzero(fmt[1:] != fmt[:-1])[0] + 1])
        return pa.table(
            {
                "fmt": pa.array(fmt[starts], type=pa.string()),
                "n_images": pa.array(np.diff(np.concatenate([starts, [len(fmt)]])), type=pa.int64()),
                "payload_bytes": pa.array(np.add.reduceat(pb, starts), type=pa.int64()),
                "raw_bytes": pa.array(np.add.reduceat(raw, starts), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("fmt")
        .aggregate(
            Sum("n_images", alias_name="n_images"),
            Sum("payload_bytes", alias_name="payload_bytes"),
            Sum("raw_bytes", alias_name="raw_bytes"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        ratio = duckdb_round(
            t["payload_bytes"].to_numpy().astype(np.float64) / t["raw_bytes"].to_numpy().astype(np.float64), 6
        )
        return t.append_column("ratio", pa.array(ratio, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow").sort("fmt")


def image_blur_scores(sf_dir: str) -> rd.Dataset:
    """Blur/sharpness quality gate: per-image integer Laplacian energy
    and gradient mass (stages.media.BlurSharpness) plus ONE mirrored
    float ``sharpness = round(lap_sq_sum / n_interior, 6)`` — the
    Laplacian-variance blur screen an image corpus runs before
    training (blurry/flat images filtered by thresholding sharpness).

    Scale shape: map-ONLY — decode fused with the two integer kernels
    in the actor pool, payloads consumed in-stage, 3 int64s + metadata
    per image leave the task; no exchange at all.  Oracle: a golden
    driver recompute with deliberately different numpy expressions.

    Output: (image_id, fmt, ok, n_interior, lap_sq_sum, grad_abs_sum,
    sharpness).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.BlurSharpness, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        lap = t["lap_sq_sum"].to_numpy().astype(np.float64)
        den = np.maximum(t["n_interior"].to_numpy().astype(np.float64), 1.0)
        sharp = duckdb_round(lap / den, 6)
        return t.append_column("sharpness", pa.array(sharp, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow").select_columns(
        ["image_id", "fmt", "ok", "n_interior", "lap_sq_sum", "grad_abs_sum", "sharpness"]
    )


def image_dedup_survivor(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Dedup SURVIVORSHIP over exact-phash clusters: for every phash,
    keep the canonical copy — the highest-resolution image, ties broken
    by smallest image_id — and report the cluster size.  This is the
    policy step after phash_dedup: a dedup pass doesn't just count
    copies, it must CHOOSE which bytes survive into the training set.

    Scale shape: metadata-only read (bytes never leave storage);
    per-batch combiner keeps ≤1 candidate row per phash per batch
    (pixel-count argmax) so the single phash-keyed exchange carries
    candidates + partial counts, never all rows; the per-slice regroup
    is the coarse-partition run-scan (phash % parts — no one-task-per-
    cluster dispatch).

    Output: (phash, n_copies, survivor_id, survivor_w, survivor_h).
    """
    ds = read_images(sf_dir, columns=["image_id", "w", "h", "phash"])

    def combiner(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy()
        w = t["w"].to_numpy().astype(np.int64)
        h = t["h"].to_numpy().astype(np.int64)
        iid = np.asarray(t["image_id"].to_pylist())
        px = w * h
        # sort: phash asc, pixels desc, image_id asc -> first row per run wins
        order = np.lexsort((iid, -px, ph))
        ph, w, h, iid, px = ph[order], w[order], h[order], iid[order], px[order]
        starts = np.concatenate([[0], np.nonzero(ph[1:] != ph[:-1])[0] + 1])
        runlen = np.diff(np.append(starts, len(ph)))
        return pa.table(
            {
                "phash": pa.array(ph[starts], type=pa.int64()),
                "image_id": pa.array(iid[starts], type=pa.string()),
                "w": pa.array(w[starts].astype(np.int32), type=pa.int32()),
                "h": pa.array(h[starts].astype(np.int32), type=pa.int32()),
                "n": pa.array(runlen.astype(np.int64), type=pa.int64()),
                "part": pa.array(ph[starts] % parts, type=pa.int64()),
            }
        )

    def regroup(g: pa.Table) -> pa.Table:
        ph = g["phash"].to_numpy()
        w = g["w"].to_numpy().astype(np.int64)
        h = g["h"].to_numpy().astype(np.int64)
        iid = np.asarray(g["image_id"].to_pylist())
        n = g["n"].to_numpy()
        px = w * h
        order = np.lexsort((iid, -px, ph))
        ph, w, h, iid, n = ph[order], w[order], h[order], iid[order], n[order]
        starts = np.concatenate([[0], np.nonzero(ph[1:] != ph[:-1])[0] + 1])
        total = np.add.reduceat(n, starts)
        return pa.table(
            {
                "phash": pa.array(ph[starts], type=pa.int64()),
                "n_copies": pa.array(total.astype(np.int64), type=pa.int64()),
                "survivor_id": pa.array(iid[starts], type=pa.string()),
                "survivor_w": pa.array(w[starts].astype(np.int32), type=pa.int32()),
                "survivor_h": pa.array(h[starts].astype(np.int32), type=pa.int32()),
            }
        )

    return (
        ds.map_batches(combiner, batch_format="pyarrow")
        .groupby("part")
        .map_groups(regroup, batch_format="pyarrow")
    )


def caption_geo_alignment(sf_dir: str) -> rd.Dataset:
    """Cross-modal consistency audit: does each image's CAPTION name the
    district its COORDINATES land in?  Extract the trailing
    "in <place>" clause, PiP-join the position against the level-8
    boundary polygons, and score alignment per place — the
    text-vs-geometry agreement gate a captioned geo corpus runs before
    contrastive training (systematic misalignment = bad geocoding or
    template captions).

    Scale shape: map-ONLY — the regex extraction is vectorized Arrow,
    the boundary index broadcasts once into the PiP actor pool, the
    anti-join covers the uncontained ("the countryside") stream, and
    only (place, n, n_aligned) partials reach the single bounded
    groupby.

    Output: (place, n_images, n_aligned, align_rate).
    """
    import pyarrow.compute as pc

    from ..pipelines.spatial import boundary_index_ref
    from ..stages import geo
    from ..stages.common import duckdb_round

    idx_ref = boundary_index_ref(admin_level=8)
    ds = read_images(sf_dir, columns=["image_id", "caption"])

    def prep(t: pa.Table) -> pa.Table:
        ids = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        m = pc.extract_regex(t["caption"], r" in (?P<place>.+)$")
        return pa.table(
            {
                "lon": pa.array(fixtures.derive_lon(ids), type=pa.float64()),
                "lat": pa.array(fixtures.derive_lat(ids), type=pa.float64()),
                "place": pc.struct_field(m, "place"),
            }
        )

    pts = ds.map_batches(prep, batch_format="pyarrow")

    def score_in(t: pa.Table) -> pa.Table:
        place = t["place"].to_numpy(zero_copy_only=False)
        name = t["admin_name"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "place": t["place"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), type=pa.int64()),
                "aligned": pa.array((place == name).astype(np.int64), type=pa.int64()),
            }
        )

    def score_out(t: pa.Table) -> pa.Table:
        place = t["place"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "place": t["place"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64), type=pa.int64()),
                "aligned": pa.array((place == "the countryside").astype(np.int64), type=pa.int64()),
            }
        )

    inside = pts.map_batches(
        geo.PiPJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("place",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    ).map_batches(score_in, batch_format="pyarrow")
    outside = pts.map_batches(
        geo.PiPAntiJoinActor,
        fn_constructor_kwargs=dict(index_ref=idx_ref, keep_cols=("place",)),
        batch_format="pyarrow",
        concurrency=(1, 8),
        batch_size=8192,
    ).map_batches(score_out, batch_format="pyarrow")

    agg = (
        inside.union(outside)
        .groupby("place")
        .aggregate(Sum("one", alias_name="n_images"), Sum("aligned", alias_name="n_aligned"))
    )

    def finish(t: pa.Table) -> pa.Table:
        rate = duckdb_round(
            t["n_aligned"].to_numpy().astype(np.float64) / t["n_images"].to_numpy().astype(np.float64), 6
        )
        return t.append_column("align_rate", pa.array(rate, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def image_quality_survivor(sf_dir: str, parts: int = 32) -> rd.Dataset:
    """Quality-aware dedup survivorship: per exact-phash cluster keep
    the SHARPEST copy (max Laplacian energy per interior pixel, ties to
    smallest image_id) — the composition of the blur gate
    (:func:`image_blur_scores`) with phash dedup that a curation
    pipeline actually ships: among duplicates, keep the best-quality
    bytes, not an arbitrary first.

    Scale shape: decode + sharpness fused in the actor pool (pixels
    never shuffle; the int64 pair (lap_sq_sum, n_interior) rides with
    phash), per-batch ≤1-candidate-per-phash combiner, ONE bucketed
    run-scan.  The ordering key is the exact integer fixed-point
    per-pixel energy ``score = (lap_sq_sum << 20) // n_interior`` —
    floor division, bit-identical in NumPy and the SQL mirror (no
    float division in any ordering).

    Output: (phash, n_copies, survivor_id, survivor_score).
    """
    from ..stages import media

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt", "phash"])
    scored = ds.map_batches(
        media.BlurSharpness, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    ).select_columns(["image_id", "phash", "lap_sq_sum", "n_interior"])

    def _pick(ph, iid, score, n):
        # survivor per phash run: descending integer score, ties
        # ascending image_id (pure lexsort; runs then scanned)
        order = np.lexsort((iid, -score, ph))
        ph, iid, score, n = ph[order], iid[order], score[order], n[order]
        starts = np.concatenate([[0], np.nonzero(ph[1:] != ph[:-1])[0] + 1])
        total = np.add.reduceat(n, starts)
        return ph[starts], iid[starts], score[starts], total.astype(np.int64)

    def combiner(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy()
        iid = np.asarray(t["image_id"].to_pylist())
        lap = t["lap_sq_sum"].to_numpy().astype(np.int64)
        nint = np.maximum(t["n_interior"].to_numpy().astype(np.int64), 1)
        # <<20 overflows int64 once lap_sq_sum exceeds ~8.8e12 (≈0.94 MP of
        # max-contrast content); numpy would wrap SILENTLY while the DuckDB
        # mirror raises — fail loudly here so engine and oracle never diverge
        if len(lap) and int(lap.max()) > ((1 << 63) - 1) >> 20:
            raise OverflowError(
                f"lap_sq_sum {int(lap.max())} exceeds the <<20 fixed-point headroom "
                f"({((1 << 63) - 1) >> 20}); image too large/contrasty for this score"
            )
        score = (lap << 20) // nint
        ones = np.ones(len(ph), dtype=np.int64)
        kph, kid, kscore, ktot = _pick(ph, iid, score, ones)
        return pa.table(
            {
                "phash": pa.array(kph, type=pa.int64()),
                "image_id": pa.array(kid, type=pa.string()),
                "score": pa.array(kscore, type=pa.int64()),
                "n": pa.array(ktot, type=pa.int64()),
                "part": pa.array(kph % parts, type=pa.int64()),
            }
        )

    def regroup(g: pa.Table) -> pa.Table:
        ph = g["phash"].to_numpy()
        iid = np.asarray(g["image_id"].to_pylist())
        score = g["score"].to_numpy().astype(np.int64)
        n = g["n"].to_numpy().astype(np.int64)
        kph, kid, kscore, ktot = _pick(ph, iid, score, n)
        return pa.table(
            {
                "phash": pa.array(kph, type=pa.int64()),
                "n_copies": pa.array(ktot, type=pa.int64()),
                "survivor_id": pa.array(kid, type=pa.string()),
                "survivor_score": pa.array(kscore, type=pa.int64()),
            }
        )

    return (
        scored.map_batches(combiner, batch_format="pyarrow")
        .groupby("part")
        .map_groups(regroup, batch_format="pyarrow")
    )


NEG_K = 2  # negatives per anchor
NEG_MULT = 2654435761  # Knuth multiplicative constant
NEG_STEP = 40503


def contrastive_negatives(sf_dir: str, k: int = NEG_K) -> rd.Dataset:
    """Deterministic NEGATIVE-SAMPLING plan for contrastive training:
    for every anchor image, pick k pseudo-random negative images via
    hash-derived indices (no RNG state — reproducible under any
    partitioning, the weighted_sample discipline), join the negatives'
    captions, and flag hard-negative collisions where anchor and
    negative depict the SAME district (a contrastive batch builder must
    know these: same-place pairs are label noise for geo-contrastive
    objectives).

    Scale shape: the negative ids are pure modular arithmetic map-side;
    ONE hash join ships (id, place) pairs only — captions reduce to
    their trailing place clause BEFORE the exchange, payload bytes are
    never read.

    Output: (image_id, neg_rank, neg_image_id, same_district).
    """
    import pyarrow.compute as pc

    n = images_count_for(sf_dir)
    ds = read_images(sf_dir, columns=["image_id", "caption"])

    def place_of(t: pa.Table) -> pa.Table:
        m = pc.extract_regex(t["caption"], r" in (?P<place>.+)$")
        iid = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64())
        return pa.table({"img_id": iid, "place": pc.struct_field(m, "place")})

    places = ds.map_batches(place_of, batch_format="pyarrow")

    def expand(t: pa.Table) -> pa.Table:
        img = t["img_id"].to_numpy()
        out_anchor, out_rank, out_neg, out_place = [], [], [], []
        for j in range(1, k + 1):
            neg = 1 + (img * NEG_MULT + j * NEG_STEP) % n
            # an anchor never samples itself: step once more on collision
            neg = np.where(neg == img, 1 + (neg % n), neg)
            out_anchor.append(img)
            out_rank.append(np.full(len(img), j, dtype=np.int64))
            out_neg.append(neg.astype(np.int64))
            out_place.append(t["place"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "img_id": pa.array(np.concatenate(out_anchor), type=pa.int64()),
                "neg_rank": pa.array(np.concatenate(out_rank), type=pa.int64()),
                "neg_id": pa.array(np.concatenate(out_neg), type=pa.int64()),
                "anchor_place": pa.array(np.concatenate(out_place), type=pa.string()),
            }
        )

    anchors = places.map_batches(expand, batch_format="pyarrow")
    neg_places = places.map_batches(
        lambda t: t.rename_columns(["neg_id", "neg_place"]), batch_format="pyarrow"
    )
    j = safe_join(anchors, neg_places, join_type="inner", num_partitions=8, on=("neg_id",))

    def finish(t: pa.Table) -> pa.Table:
        a = t["anchor_place"].to_numpy(zero_copy_only=False)
        b = t["neg_place"].to_numpy(zero_copy_only=False)
        img = t["img_id"].to_numpy()
        neg = t["neg_id"].to_numpy()
        return pa.table(
            {
                "image_id": pa.array([f"img-{int(i):012d}" for i in img], type=pa.string()),
                "neg_rank": t["neg_rank"],
                "neg_image_id": pa.array([f"img-{int(i):012d}" for i in neg], type=pa.string()),
                "same_district": pa.array((a == b), type=pa.bool_()),
            }
        )

    return j.map_batches(finish, batch_format="pyarrow")


CROP_K = 3  # crops per image
CROP_FRAC_NUM, CROP_FRAC_DEN = 2, 3  # crop side = 2/3 of the short side


def image_crop_manifest(sf_dir: str, k: int = CROP_K) -> rd.Dataset:
    """Deterministic CROP-SAMPLING plan for self-supervised pretraining:
    k crop windows per image, side = 2/3 of the short side, offsets
    hash-derived from (image_id, crop_rank) — all integer arithmetic,
    reproducible under any partitioning, and emittable WITHOUT decoding
    a single byte (metadata-only read: the crop planner runs before the
    expensive decode stage and its output drives sharded crop workers).

    Scale shape: map-ONLY integer arithmetic on (image_id, w, h); the
    bytes column never leaves storage; no exchange.

    Output: (image_id, crop_rank, x0, y0, side) with
    0 <= x0 <= w - side, 0 <= y0 <= h - side.
    """
    import pyarrow.compute as pc

    ds = read_images(sf_dir, columns=["image_id", "w", "h"])

    def plan(t: pa.Table) -> pa.Table:
        img = pc.cast(pc.utf8_slice_codeunits(t["image_id"], 4, 16), pa.int64()).to_numpy()
        w = t["w"].to_numpy().astype(np.int64)
        h = t["h"].to_numpy().astype(np.int64)
        side = (np.minimum(w, h) * CROP_FRAC_NUM) // CROP_FRAC_DEN
        out = []
        for j in range(1, k + 1):
            hx = (img * NEG_MULT + j * 7919) % np.maximum(w - side + 1, 1)
            hy = (img * NEG_STEP + j * 104729) % np.maximum(h - side + 1, 1)
            out.append(
                pa.table(
                    {
                        "image_id": t["image_id"],
                        "crop_rank": pa.array(np.full(len(img), j, dtype=np.int64), type=pa.int64()),
                        "x0": pa.array(hx, type=pa.int64()),
                        "y0": pa.array(hy, type=pa.int64()),
                        "side": pa.array(side, type=pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    return ds.map_batches(plan, batch_format="pyarrow")


def phash_bit_stats(sf_dir: str) -> rd.Dataset:
    """Per-BIT bias audit of the perceptual hash: for each of the 64
    phash bits, the fraction of images with that bit set — a healthy
    hash sits near 0.5 everywhere; a stuck bit (≈0 or ≈1) carries no
    discriminative information and silently weakens every Hamming-LSH
    band built on it.  The hash-quality gate for the phash dedup family.

    Scale shape: metadata-only read; per-batch popcount-per-bit
    combiner (64 int64s per batch) -> ONE 64-row groupby; the fraction
    is a mirrored division.

    Output: (bit, n_set, n_images, set_frac).
    """
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["phash"])

    def partial(t: pa.Table) -> pa.Table:
        ph = t["phash"].to_numpy().astype(np.int64).view(np.uint64)
        bits = np.arange(64, dtype=np.int64)
        set_counts = np.array(
            [int(((ph >> np.uint64(b)) & np.uint64(1)).sum()) for b in range(64)], dtype=np.int64
        )
        return pa.table(
            {
                "bit": pa.array(bits, type=pa.int64()),
                "n_set": pa.array(set_counts, type=pa.int64()),
                "n": pa.array(np.full(64, len(ph), dtype=np.int64), type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Sum("n_set", alias_name="n_set"), Sum("n", alias_name="n_images"))
    )

    def finish(t: pa.Table) -> pa.Table:
        frac = duckdb_round(
            t["n_set"].to_numpy().astype(np.float64) / t["n_images"].to_numpy().astype(np.float64), 6
        )
        return t.append_column("set_frac", pa.array(frac, type=pa.float64()))

    return agg.map_batches(finish, batch_format="pyarrow")


def split_leakage_phash(sf_dir: str) -> rd.Dataset:
    """Cross-split eval-leakage audit: assign every image to
    train/val/test by the first hex digit of md5(image_id) (the same
    content-stable 12/2/2 convention as dedup.hash_split_counts) and
    count perceptual-hash values that appear in MORE THAN ONE split —
    each shared phash is an exact duplicate leaking across the
    train/eval boundary, the image sibling of text decontamination.

    Scale shape: split assignment is a pure map; ONE distinct pass over
    (phash, split) (map-side np.unique combiner + groupby count, rows
    bounded by distinct phashes x 3); the per-phash split-pair fan-out
    is <= C(3,2)=3 rows; the final count groupby is 3-row bounded.
    Output: (split_a, split_b, n_shared_phashes) sorted.
    """
    import hashlib

    from .dedup import SPLIT_OF_HEX

    ds = read_images(sf_dir, columns=["image_id", "phash"])

    def assign(t: pa.Table) -> pa.Table:
        ids = t["image_id"].to_pylist()
        split = [SPLIT_OF_HEX[hashlib.md5(s.encode()).hexdigest()[0]] for s in ids]
        ph = t["phash"].to_numpy().astype(np.int64)
        # map-side distinct combiner: unique (phash, split) within batch
        key = pa.table({"phash": pa.array(ph, type=pa.int64()), "split": pa.array(split, type=pa.string())})
        df = key.to_pandas().drop_duplicates()  # bounded: per-batch distinct combiner (inside map, not a driver collect)
        return pa.Table.from_pandas(df, preserve_index=False)

    distinct = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby(["phash", "split"])
        .aggregate(Count(alias_name="_n"))
        .drop_columns(["_n"])
    )

    def pairs(g: pa.Table) -> pa.Table:
        s = sorted(g["split"].to_pylist())
        if len(s) < 2:
            return pa.table(
                {
                    "split_a": pa.array([], type=pa.string()),
                    "split_b": pa.array([], type=pa.string()),
                    "n": pa.array([], type=pa.int64()),
                }
            )
        a, b = zip(*[(s[i], s[j]) for i in range(len(s)) for j in range(i + 1, len(s))])
        return pa.table(
            {
                "split_a": pa.array(a, type=pa.string()),
                "split_b": pa.array(b, type=pa.string()),
                "n": pa.array([1] * len(a), type=pa.int64()),
            }
        )

    return (
        distinct.groupby("phash")
        .map_groups(pairs, batch_format="pyarrow")
        .groupby(["split_a", "split_b"])
        .aggregate(Sum("n", alias_name="n_shared_phashes"))
        .sort(["split_a", "split_b"])
    )


# ---------------------------------------------------------------------------
# SSIM fidelity audit of the lossy codec
# ---------------------------------------------------------------------------

SSIM_FP = 1e9  # fixed-point scale: per-image SSIM -> int64 before the sum


def image_ssim_audit(sf_dir: str, target_fmt: str = "dctq") -> rd.Dataset:
    """Structural-similarity audit of the lossy ``dctq`` recompression:
    per source format, the mean and minimum 8x8-window SSIM between the
    original pixels and a decode(encode(px, dctq)) round trip — the
    perceptual metric beside image_lossy_migration's PSNR gate (PSNR
    measures energy, SSIM structure; flat-field noise can pass one and
    fail the other).

    Per-image SSIM is fixed-pointed to int64 (``floor(s*1e9+0.5)``)
    before the aggregate, so the per-format mean is an ORDER-FREE
    integer sum — the trajectory/k-means partial-sum discipline.
    Pixels never leave the stage; only (fmt, fp) rows shuffle.
    Oracle: golden local recompute of the identical kernel.
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Min as _Min

    from ..codecs import decode_image, encode_image, ssim8x8

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])

    def score(t: pa.Table) -> pa.Table:
        w = t["w"].to_numpy()
        h = t["h"].to_numpy()
        fmts = t["fmt"].to_pylist()
        payloads = t["bytes"].to_pylist()
        fp = np.empty(t.num_rows, dtype=np.int64)
        for i in range(t.num_rows):
            px = decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
            rt = decode_image(encode_image(px, target_fmt), int(w[i]), int(h[i]), target_fmt)
            fp[i] = np.int64(np.floor(ssim8x8(px, rt) * SSIM_FP + 0.5))
        return pa.table({"fmt": pa.array(fmts, type=pa.string()), "fp": pa.array(fp, type=pa.int64())})

    agg = (
        ds.map_batches(score, batch_format="pyarrow", batch_size=512, concurrency=8)
        .groupby("fmt")
        .aggregate(
            _Count(alias_name="n_images"),
            Sum("fp", alias_name="fp_sum"),
            _Min("fp", alias_name="fp_min"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_images"].to_numpy()
        fsum = t["fp_sum"].to_numpy()
        fmin = t["fp_min"].to_numpy()
        return pa.table(
            {
                "fmt": t["fmt"],
                "n_images": pa.array(n.astype(np.int64)),
                "mean_ssim": pa.array(np.round(fsum / n / SSIM_FP, 6), type=pa.float64()),
                "min_ssim": pa.array(np.round(fmin / SSIM_FP, 6), type=pa.float64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("fmt")


def image_entropy(sf_dir: str) -> rd.Dataset:
    """Per-image pixel-value entropy audit (stages.media.PixelEntropy):
    the flat/synthetic screen — near-zero H marks solid fills and hard
    banding, maximal H marks noise — run beside the blur gate before
    an image corpus trains anything.

    Scale shape: map-ONLY — decode fused with the histogram kernel in
    the actor pool, payloads consumed in-stage, three int64s + metadata
    per image leave the task; no exchange at all.  Oracle: golden
    driver recompute with independent histogram/entropy expressions.

    Output: (image_id, fmt, ok, n_samples, n_distinct, entropy).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.PixelEntropy, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.maximum(t["n_samples"].to_numpy().astype(np.float64), 1.0)
        sfp = t["sum_nlogn_fp"].to_numpy().astype(np.float64)
        ent = duckdb_round(np.log(n) - (sfp / media.PixelEntropy.FP) / n, 6)
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "ok": t["ok"],
                "n_samples": t["n_samples"],
                "n_distinct": t["n_distinct"],
                "entropy": pa.array(ent, type=pa.float64()),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def caption_conflict_dups(sf_dir: str) -> rd.Dataset:
    """Cross-modal dedup conflict: captions attached to MORE THAN ONE
    distinct image (same caption text, different phash) — the
    text-image misalignment screen an image-caption corpus runs before
    training (a caption reused across unrelated pixels is a label
    conflict; exact-dup pixels under one caption are fine and handled
    by phash_dedup).

    Scale shape: metadata-only read (bytes never leave storage); the
    distinct count is the two-level reduce — per-batch unique
    (caption, phash) pairs, a (caption, phash)-keyed count groupby,
    then a caption-keyed fold of (copies, distinct-phash) — no
    count-distinct shuffle of raw rows.  Output: (caption, n_images,
    n_phashes) for conflicted captions only.
    """
    ds = read_images(sf_dir, columns=["caption", "phash"])

    def pair_combiner(t: pa.Table) -> pa.Table:
        import pandas as pd

        df = pd.DataFrame(
            {"caption": t["caption"].to_numpy(zero_copy_only=False), "phash": t["phash"].to_numpy()}
        )
        c = df.groupby(["caption", "phash"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "caption": pa.array(c["caption"], type=pa.string()),
                "phash": pa.array(c["phash"].to_numpy().astype(np.int64), type=pa.int64()),
                "n": pa.array(c["n"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    per_pair = (
        ds.map_batches(pair_combiner, batch_format="pyarrow")
        .groupby(["caption", "phash"])
        .aggregate(Sum("n", alias_name="n"))
    )

    def fold(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "caption": t["caption"],
                "n": t["n"],
                "one": pa.array(np.ones(t.num_rows, dtype=np.int64)),
            }
        )

    agg = (
        per_pair.map_batches(fold, batch_format="pyarrow")
        .groupby("caption")
        .aggregate(Sum("n", alias_name="n_images"), Sum("one", alias_name="n_phashes"))
    )

    def keep_conflicts(t: pa.Table) -> pa.Table:
        m = (t["n_images"].to_numpy() > 1) & (t["n_phashes"].to_numpy() > 1)
        return pa.table(
            {
                "caption": t["caption"].filter(pa.array(m)),
                "n_images": pa.array(t["n_images"].to_numpy()[m], type=pa.int64()),
                "n_phashes": pa.array(t["n_phashes"].to_numpy()[m], type=pa.int64()),
            }
        )

    return agg.map_batches(keep_conflicts, batch_format="pyarrow")


def image_edge_density(sf_dir: str) -> rd.Dataset:
    """Per-image edge-pixel density audit (stages.media.EdgeDensity):
    the texture screen — edge_frac near 0 marks flat fills, near 1
    marks dithered noise, the photographic mid-range survives — run
    beside the blur gate and the entropy screen before an image corpus
    trains anything (reference analogue: the ST5/M9 image gate layer).

    Scale shape: map-ONLY — decode fused with the gradient kernel in
    the actor pool, payloads consumed in-stage, three int64s +
    metadata per image leave the task; no exchange at all.  Oracle:
    golden driver recompute with an independent per-image scalar loop.

    Output: (image_id, fmt, ok, n_interior, n_edge, n_strong,
    edge_frac).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.EdgeDensity, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.maximum(t["n_interior"].to_numpy().astype(np.float64), 1.0)
        frac = duckdb_round(t["n_edge"].to_numpy().astype(np.float64) / n, 6)
        return t.append_column("edge_frac", pa.array(frac, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def image_palette(sf_dir: str) -> rd.Dataset:
    """Per-image dominant-color census over the 12-bit palette code
    (top 4 bits of each channel → 4096 cells): top-2 codes, their
    pixel fractions, and the distinct-code count — the color-metadata
    column an image catalog filters on (near-monochrome detection,
    palette-based grouping), beside the grayscale flag and entropy.

    Exactness: codes and counts are integers (bincount over the 4096
    cells); ties on the argmax break to the SMALLER code (mirrored);
    only the two fractions are floats, mirrored.

    Scale shape: map-ONLY in the decode pool; five int64s + two floats
    per image leave the task.  Output: (image_id, fmt, ok, n_px,
    n_codes, top_code, top_frac, second_code, second_frac).
    """
    from .. import codecs as _codecs
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])

    class Palette:
        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            w = t["w"].to_numpy()
            h = t["h"].to_numpy()
            fmts = t["fmt"].to_pylist()
            payloads = t["bytes"].to_pylist()
            cols = {k: np.zeros(n, dtype=np.int64) for k in ("n_px", "n_codes", "top_code", "top_n", "second_code", "second_n")}
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                try:
                    px = _codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i]).astype(np.int64)
                    code = ((px[:, :, 0] >> 4) << 8) | ((px[:, :, 1] >> 4) << 4) | (px[:, :, 2] >> 4)
                    hist = np.bincount(code.ravel(), minlength=4096)
                    cols["n_px"][i] = code.size
                    cols["n_codes"][i] = int((hist > 0).sum())
                    top = int(np.argmax(hist))  # first max = smallest code
                    cols["top_code"][i] = top
                    cols["top_n"][i] = int(hist[top])
                    hist[top] = -1
                    if cols["n_codes"][i] > 1:
                        second = int(np.argmax(hist))
                        cols["second_code"][i] = second
                        cols["second_n"][i] = int(hist[second])
                    ok[i] = True
                except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                    pass
            npx = np.maximum(cols["n_px"].astype(np.float64), 1.0)
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "fmt": t["fmt"],
                    "ok": pa.array(ok),
                    "n_px": pa.array(cols["n_px"], type=pa.int64()),
                    "n_codes": pa.array(cols["n_codes"], type=pa.int64()),
                    "top_code": pa.array(cols["top_code"], type=pa.int64()),
                    "top_frac": pa.array(duckdb_round(cols["top_n"] / npx, 6), type=pa.float64()),
                    "second_code": pa.array(cols["second_code"], type=pa.int64()),
                    "second_frac": pa.array(duckdb_round(cols["second_n"] / npx, 6), type=pa.float64()),
                }
            )

    return ds.map_batches(Palette, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))


def dct_energy_profile(sf_dir: str) -> rd.Dataset:
    """Corpus-wide DCT energy-compaction profile of the ``dctq`` codec:
    per zigzag band (u+v = 0..14), the exact quantized-coefficient
    energy Σq², coefficient counts and sparsity — the measurement
    behind the codec's step table (how much signal lives in each
    frequency band decides where quantization can afford to be coarse;
    the JPEG design question answered on THIS corpus).

    Exactness: the quantized coefficients are the SHARED integer kernel
    (codecs.dctq_quantized — the exact ints _dctq_encode stores);
    band energies are int64 sums, order-free; only the energy
    fractions are floats, mirrored.  The golden oracle aggregates the
    same integers through an independent per-block Python path.

    Scale shape: decode + transform + band reduction fused in the
    actor pool (15 int64 triples per image leave the task), ONE
    15-row groupby.  Output: (band, n_coeffs, n_nonzero, energy,
    energy_frac) rounded 6, sorted by band.
    """
    from .. import codecs as _codecs
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    band_of = (np.arange(8)[:, None] + np.arange(8)[None, :]).ravel()  # zigzag band per (u, v)

    class BandEnergy:
        def __call__(self, t: pa.Table) -> pa.Table:
            w = t["w"].to_numpy()
            h = t["h"].to_numpy()
            fmts = t["fmt"].to_pylist()
            payloads = t["bytes"].to_pylist()
            energy = np.zeros(15, dtype=np.int64)
            nz = np.zeros(15, dtype=np.int64)
            n_coef = np.zeros(15, dtype=np.int64)
            for i in range(t.num_rows):
                px = _codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                q = _codecs.dctq_quantized(px).astype(np.int64)  # (3, nb, 8, 8)
                flat = q.reshape(-1, 64)
                # per-coefficient reductions once, then a 64->15 band fold
                e64 = (flat * flat).sum(axis=0)
                nz64 = (flat != 0).sum(axis=0)
                np.add.at(energy, band_of, e64)
                np.add.at(nz, band_of, nz64)
                np.add.at(n_coef, band_of, np.full(64, flat.shape[0], dtype=np.int64))
            return pa.table(
                {
                    "band": pa.array(np.arange(15, dtype=np.int64)),
                    "energy": pa.array(energy),
                    "n_nonzero": pa.array(nz),
                    "n_coeffs": pa.array(n_coef),
                }
            )

    agg = (
        ds.map_batches(BandEnergy, batch_format="pyarrow", batch_size=128, concurrency=(1, 8))
        .groupby("band")
        .aggregate(
            Sum("energy", alias_name="energy"),
            Sum("n_nonzero", alias_name="n_nonzero"),
            Sum("n_coeffs", alias_name="n_coeffs"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.sort_by("band")
        e = t["energy"].to_numpy().astype(np.float64)
        frac = duckdb_round(e / e.sum(), 6)
        return pa.table(
            {
                "band": t["band"].cast(pa.int64()),
                "n_coeffs": t["n_coeffs"].cast(pa.int64()),
                "n_nonzero": t["n_nonzero"].cast(pa.int64()),
                "energy": t["energy"].cast(pa.int64()),
                "energy_frac": pa.array(frac, type=pa.float64()),
            }
        )

    return agg.repartition(1).map_batches(finish, batch_format="pyarrow")


def image_blob_count(sf_dir: str) -> rd.Dataset:
    """Per-image bright-region census (stages.media.BlobCount):
    connected components of gray > T at 4-connectivity — object-count
    fragmentation screen (1 blob = solid fill, few = photographic,
    thousands = dither/noise), run beside the edge and entropy gates
    (reference analogue: the ST5/M9 image gate layer).

    Scale shape: map-ONLY — decode fused with the union-find census
    in the actor pool, payloads consumed in-stage, three int64s +
    metadata per image leave the task.  Oracle: golden BFS flood-fill
    recompute (different CC algorithm, same integer answer).

    Output: (image_id, fmt, ok, n_bright, n_blobs, largest_blob,
    fragmentation), fragmentation = n_blobs / max(n_bright, 1).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.BlobCount, batch_format="pyarrow", batch_size=128, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        nb = np.maximum(t["n_bright"].to_numpy().astype(np.float64), 1.0)
        frag = duckdb_round(t["n_blobs"].to_numpy().astype(np.float64) / nb, 6)
        return t.append_column("fragmentation", pa.array(frag, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def image_channel_correlation(sf_dir: str) -> rd.Dataset:
    """Per-image channel-pair Pearson correlations + an EXACT grayscale
    flag (stages.media.ChannelMoments) — the grayscale / palette-render
    screen of an image corpus audit: grayscale ⟺ Σ(r−g)² = Σ(g−b)² = 0
    (integer, no epsilon), synthetic palette renders show near-±1
    correlations, photographs sit in between.  Run beside the entropy
    and edge screens before an image corpus trains anything (reference
    analogue: the ST5/M9 image gate layer).

    Determinism: the moments are exact int64 (overflow-guarded in the
    stage); each correlation is ONE mirrored float expression
    num/sqrt(va·vb) with integer num/va/vb, so the engine and the
    golden oracle agree bit-for-bit before the shared round(6).

    Scale shape: map-ONLY — decode fused with the moment kernel in the
    actor pool, payloads consumed in-stage, 8 int64s + metadata per
    image leave the task; no exchange at all.

    Output: (image_id, fmt, ok, n_px, corr_rg, corr_gb, corr_rb,
    is_grayscale).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.ChannelMoments, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        n = t["n_px"].to_numpy()
        s = {k: t[k].to_numpy() for k in ("s_r", "s_g", "s_b", "s_rr", "s_gg", "s_bb", "s_rg", "s_gb", "s_rb")}

        def corr(sa, sb, saa, sbb, sab):
            num = (n * sab - sa * sb).astype(np.float64)
            va = (n * saa - sa * sa).astype(np.float64)
            vb = (n * sbb - sb * sb).astype(np.float64)
            den = np.sqrt(va * vb)
            with np.errstate(divide="ignore", invalid="ignore"):
                c = np.where(den > 0.0, num / den, 0.0)
            return duckdb_round(c, 6)

        gray = ((s["s_rr"] - 2 * s["s_rg"] + s["s_gg"]) == 0) & ((s["s_gg"] - 2 * s["s_gb"] + s["s_bb"]) == 0)
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "ok": t["ok"],
                "n_px": t["n_px"],
                "corr_rg": pa.array(corr(s["s_r"], s["s_g"], s["s_rr"], s["s_gg"], s["s_rg"]), type=pa.float64()),
                "corr_gb": pa.array(corr(s["s_g"], s["s_b"], s["s_gg"], s["s_bb"], s["s_gb"]), type=pa.float64()),
                "corr_rb": pa.array(corr(s["s_r"], s["s_b"], s["s_rr"], s["s_bb"], s["s_rb"]), type=pa.float64()),
                "is_grayscale": pa.array(gray & t["ok"].to_numpy(zero_copy_only=False)),
            }
        )

    return scored.map_batches(finish, batch_format="pyarrow")


def phash_dedup_eval(sf_dir: str, max_dist: int = 3) -> rd.Dataset:
    """End-to-end precision/recall audit of the phash near-dup
    detector against the corpus's PLANTED ground truth (every
    NEAR_DUP_STRIDE-th image reuses its predecessor's pixels —
    fixtures.make_images) — the measured-quality harness for the image
    dedup family, exactly what lsh_blocking_eval is for text: recall
    says the planted copies are found, precision counts how much
    hash-collision noise rides along (phash collisions on small tiles
    are EXPECTED extra pairs — they are near-dups by the hash's own
    definition, so precision here reads as "planted share", not error).

    Scale shape: the detector side is the real banded Hamming-LSH
    pipeline; the truth side is a pure id-arithmetic map (no pixels);
    the comparison joins two pair tables driver-side (pair-bounded).
    Output: one row (n_truth, n_detected, n_hit, recall,
    planted_share) rounded 6.
    """
    from .. import fixtures as _fx
    from ..stages.common import duckdb_round

    detected = phash_near_dup_pairs(sf_dir, max_dist=max_dist).to_pandas()
    ia = detected["image_id_a"].map(lambda s: int(str(s)[4:16])).to_numpy()
    ib = detected["image_id_b"].map(lambda s: int(str(s)[4:16])).to_numpy()
    det = {(int(a), int(b)) for a, b in zip(np.minimum(ia, ib), np.maximum(ia, ib))}
    n = images_count_for(sf_dir)
    truth = {
        (i - 1, i)
        for i in range(_fx.NEAR_DUP_STRIDE, n + 1, _fx.NEAR_DUP_STRIDE)
        if i > 1
    }
    hit = len(truth & det)
    recall = hit / max(len(truth), 1)
    share = hit / max(len(det), 1)
    return rd.from_arrow(
        pa.table(
            {
                "n_truth": pa.array([len(truth)], type=pa.int64()),
                "n_detected": pa.array([len(det)], type=pa.int64()),
                "n_hit": pa.array([hit], type=pa.int64()),
                "recall": pa.array(
                    duckdb_round(np.array([recall]), 6), type=pa.float64()
                ),
                "planted_share": pa.array(
                    duckdb_round(np.array([share]), 6), type=pa.float64()
                ),
            }
        )
    )


def image_orientation_histogram(sf_dir: str) -> rd.Dataset:
    """Per-image gradient-orientation census (stages.media.
    OrientationHistogram): the HOG descriptor's exact-integer core —
    8 octant counts over central-difference gradients, the dominant
    octant, and the anisotropy share — the texture-directionality
    screen (synthetic axis-aligned renders spike one octant pair;
    photographs spread) run beside the edge / entropy / blur gates
    (reference analogue: the ST5/M9 image gate layer).

    Determinism: octants come from sign/magnitude comparisons only
    (no atan2); the dominant octant is an integer argmax with ties to
    the smallest index (mirrored in the golden oracle's if/elif
    recompute); anisotropy = round(max_count / n_grad, 6) is the only
    float.

    Scale shape: map-ONLY — decode fused with the gradient kernel in
    the actor pool, payloads consumed in-stage, ten int64s + metadata
    per image leave the task; no exchange at all.

    Output: (image_id, fmt, ok, o0..o7, n_flat, n_grad, dominant,
    anisotropy).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.OrientationHistogram, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        octs = np.stack([t[f"o{k}"].to_numpy() for k in range(8)], axis=1)
        n_grad = octs.sum(axis=1)
        dominant = octs.argmax(axis=1).astype(np.int64)  # first max = smallest octant
        aniso = duckdb_round(
            octs.max(axis=1).astype(np.float64) / np.maximum(n_grad, 1).astype(np.float64), 6
        )
        t = t.append_column("n_grad", pa.array(n_grad, type=pa.int64()))
        t = t.append_column("dominant", pa.array(dominant, type=pa.int64()))
        return t.append_column("anisotropy", pa.array(aniso, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def image_haar_energy(sf_dir: str) -> rd.Dataset:
    """Per-image Haar wavelet subband-energy audit (stages.media.
    HaarEnergy): exact-integer LL/LH/HL/HH energies over 2×2 blocks
    plus the detail share — the wavelet-domain compaction screen
    beside dct_energy_profile's frequency bands (reference analogue:
    the ST5 codec-table layer).

    Determinism: the four energies are exact int64; detail_frac =
    round((e_lh+e_hl+e_hh)/total, 6) is the only float, mirrored in
    the golden per-block recompute.

    Scale shape: map-ONLY — decode fused with the transform in the
    actor pool, payloads consumed in-stage, five int64s + metadata per
    image leave the task; no exchange at all.

    Output: (image_id, fmt, ok, n_blocks, e_ll, e_lh, e_hl, e_hh,
    detail_frac).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.HaarEnergy, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        det = (
            t["e_lh"].to_numpy().astype(np.float64)
            + t["e_hl"].to_numpy()
            + t["e_hh"].to_numpy()
        )
        tot = np.maximum(det + t["e_ll"].to_numpy(), 1.0)
        frac = duckdb_round(det / tot, 6)
        return t.append_column("detail_frac", pa.array(frac, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def image_dynamic_range(sf_dir: str) -> rd.Dataset:
    """Per-image dynamic-range / contrast audit (stages.media.
    DynamicRange): exact min/max and p05/p95 gray order statistics
    plus the robust range-utilization share — the exposure screen
    (narrow-band = washed-out scan, pinned tails = over-processed)
    beside the entropy / edge / blur gates (reference analogue: the
    ST5/M9 image gate layer).

    Determinism: order statistics by exact integer histogram rank
    selection (quantile_disc convention); range_util = round((p95 −
    p05)/765, 6) is the only float, mirrored in the golden sorted()
    recompute.

    Scale shape: map-ONLY — decode fused with the histogram kernel in
    the actor pool, payloads consumed in-stage, six int64s + metadata
    per image leave the task; no exchange at all.

    Output: (image_id, fmt, ok, g_min, g_max, p05, p95, range_util).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.DynamicRange, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        util = duckdb_round(
            (t["p95"].to_numpy() - t["p05"].to_numpy()).astype(np.float64) / 765.0, 6
        )
        return t.append_column("range_util", pa.array(util, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


PHASH_THUMB_SIDE = 8  # worst-case thumbnail (the hash's own block grid)


def phash_scale_stability(sf_dir: str, side: int = PHASH_THUMB_SIDE) -> rd.Dataset:
    """Perceptual-hash scale-stability audit: Hamming distance between
    phash64 of the ORIGINAL pixels and phash64 of a nearest-neighbor
    thumbnail — the invariance property every thumbnail-dedup shortcut
    silently assumes (hash the 8×8 preview, trust it matches the
    full-res hash).  A corpus whose distances are large cannot dedup
    on thumbnails (reference analogue: the ST5 codec/phash layer).

    Determinism: both hashes are the exact phash64 kernel; the
    thumbnail is integer-index nearest-neighbor resize; Hamming is a
    popcount of the XOR — all integers.

    Scale shape: map-ONLY — decode + resize + two hashes fused in the
    actor pool, payloads consumed in-stage, three int64s + metadata
    per image leave; the distance histogram is a (dist)-bounded
    groupby mirrored from the per-image rows driver-side.

    Output: (image_id, fmt, ok, phash_full, phash_thumb, hamming).
    """
    from .. import codecs as _codecs
    from ..stages import media

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])

    class ScaleStab:
        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            w = t["w"].to_numpy()
            h = t["h"].to_numpy()
            fmts = t["fmt"].to_pylist()
            payloads = t["bytes"].to_pylist()
            pf = np.zeros(n, dtype=np.int64)
            pt = np.zeros(n, dtype=np.int64)
            ham = np.zeros(n, dtype=np.int64)
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                try:
                    px = _codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                    thumb = media.resize_nearest(px, side, side)
                    a = _codecs.phash64(px)
                    b = _codecs.phash64(thumb)
                    pf[i], pt[i] = a, b
                    ham[i] = bin((a ^ b) & ((1 << 64) - 1)).count("1")
                    ok[i] = True
                except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                    pass
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "fmt": t["fmt"],
                    "ok": pa.array(ok),
                    "phash_full": pa.array(pf, type=pa.int64()),
                    "phash_thumb": pa.array(pt, type=pa.int64()),
                    "hamming": pa.array(ham, type=pa.int64()),
                }
            )

    return ds.map_batches(ScaleStab, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))


def image_blockiness(sf_dir: str) -> rd.Dataset:
    """Per-image blocking-artifact audit (stages.media.Blockiness):
    the boundary-vs-interior gradient ratio that exposes prior 8×8
    block-transform compression (JPEG in the wild; dctq here) inside
    a nominally lossless corpus — run beside the fidelity gate when
    provenance claims "original" (reference analogue: the ST5 codec
    layer; the detector for its own lossy leg).

    Determinism: the four (sum, count) pairs are exact int64;
    blockiness = round((b_sum/b_cnt) / max(i_sum/i_cnt, eps), 6) is
    the one mirrored float (eps guards flat fills).

    Scale shape: map-ONLY — decode fused with the gradient split in
    the actor pool, payloads consumed in-stage, four int64s +
    metadata per image leave; no exchange at all.

    Output: (image_id, fmt, ok, b_sum, b_cnt, i_sum, i_cnt,
    blockiness).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.Blockiness, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        bm = t["b_sum"].to_numpy() / np.maximum(t["b_cnt"].to_numpy(), 1)
        im = t["i_sum"].to_numpy() / np.maximum(t["i_cnt"].to_numpy(), 1)
        ratio = duckdb_round(bm / np.maximum(im, 1e-9), 6)
        return t.append_column("blockiness", pa.array(ratio, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def image_saliency_centroid(sf_dir: str) -> rd.Dataset:
    """Per-image saliency-centroid composition audit: the center of
    mass of the L1 gradient field (where the detail IS) and its offset
    from the geometric center — the framing screen (centered subject ≈
    0; edge-weighted texture pushes the centroid out) a curation
    pipeline pairs with the blur/entropy gates when selecting training
    crops (image_crop_manifest picks the crops; this says where they
    should anchor).

    Exactness: gradient magnitudes and the moment sums Σm, Σm·x, Σm·y
    are exact int64 (m ≤ 3060, coords < 2^16 — headroom to 8K video
    stills); the two centroid coordinates and the offset norm are
    mirrored float expressions over those integers.

    Scale shape: map-ONLY — decode fused with the moment kernel in the
    actor pool, payloads consumed in-stage, three int64s + metadata
    per image leave; no exchange at all.

    Output: (image_id, fmt, ok, m_sum, mx_sum, my_sum, offset_norm) —
    offset_norm = centroid-to-center distance over the half-diagonal,
    in [0, ~1].
    """
    from .. import codecs as _codecs
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])

    class Saliency:
        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            w = t["w"].to_numpy()
            h = t["h"].to_numpy()
            fmts = t["fmt"].to_pylist()
            payloads = t["bytes"].to_pylist()
            ms = np.zeros(n, dtype=np.int64)
            mx = np.zeros(n, dtype=np.int64)
            my = np.zeros(n, dtype=np.int64)
            off = np.zeros(n, dtype=np.float64)
            ok = np.zeros(n, dtype=bool)
            for i in range(n):
                try:
                    px = _codecs.decode_image(payloads[i], int(w[i]), int(h[i]), fmts[i])
                    g = px.astype(np.int64).sum(axis=2)
                    gx = np.abs(g[1:-1, 2:] - g[1:-1, :-2])
                    gy = np.abs(g[2:, 1:-1] - g[:-2, 1:-1])
                    m = gx + gy  # interior L1 gradient, exact
                    ys, xs = np.mgrid[1 : g.shape[0] - 1, 1 : g.shape[1] - 1]
                    ms[i] = int(m.sum())
                    mx[i] = int((m * xs).sum())
                    my[i] = int((m * ys).sum())
                    if ms[i]:
                        cx = mx[i] / ms[i]
                        cy = my[i] / ms[i]
                        dx = cx - (int(w[i]) - 1) / 2.0
                        dy = cy - (int(h[i]) - 1) / 2.0
                        half_diag = math.hypot((int(w[i]) - 1) / 2.0, (int(h[i]) - 1) / 2.0)
                        off[i] = math.hypot(dx, dy) / half_diag
                    ok[i] = True
                except Exception:  # noqa: BLE001 — bad rows flagged, not fatal (M9)
                    pass
            return pa.table(
                {
                    "image_id": t["image_id"],
                    "fmt": t["fmt"],
                    "ok": pa.array(ok),
                    "m_sum": pa.array(ms, type=pa.int64()),
                    "mx_sum": pa.array(mx, type=pa.int64()),
                    "my_sum": pa.array(my, type=pa.int64()),
                    "offset_norm": pa.array(duckdb_round(off, 6), type=pa.float64()),
                }
            )

    return ds.map_batches(Saliency, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))


def image_otsu(sf_dir: str) -> rd.Dataset:
    """Per-image Otsu threshold + foreground fraction
    (stages.media.OtsuThreshold): the bimodality/separability audit —
    scans, slides and rendered figures binarize cleanly (high fg/bg
    separation at a stable threshold) while natural photos don't; a
    captioned-image corpus uses it to route document-like images away
    from the photo pipeline.

    Scale shape: map-ONLY — decode fused with the histogram + exact
    integer argmax in the actor pool, payloads consumed in-stage,
    three int64s + metadata per image leave the task; no exchange.
    Oracle: golden driver recompute with Fraction-based argmax
    (different comparison arithmetic, same integers).

    Output: (image_id, fmt, ok, threshold, n_px, n_fg, fg_frac).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.OtsuThreshold, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        npx = np.maximum(t["n_px"].to_numpy().astype(np.float64), 1.0)
        frac = duckdb_round(t["n_fg"].to_numpy().astype(np.float64) / npx, 6)
        return t.append_column("fg_frac", pa.array(frac, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def image_quadtree(sf_dir: str) -> rd.Dataset:
    """Per-image adaptive quadtree census (stages.media.QuadtreeCensus):
    leaf/depth structure of the variance-split decomposition — the
    local-detail screen a compression-aware curator reads next to
    entropy and blur (few leaves = flat/synthetic, max-depth everywhere
    = noise).

    Scale shape: map-ONLY actor-pool pass, decode fused with the
    summed-area tables and the integer split recursion; payloads
    consumed in-stage, three int64s + metadata leave per image.
    Oracle: golden recompute with DIRECT per-block numpy sums (no SAT)
    and BFS order — different arithmetic path, same integers.

    Output: (image_id, fmt, ok, n_leaves, max_depth, n_split).
    """
    from ..stages import media

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(
        media.QuadtreeCensus, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )


def image_harris_corners(sf_dir: str) -> rd.Dataset:
    """Per-image Harris interest-point census (stages.media
    .HarrisCorners): exact-integer structure-tensor response with
    non-max suppression — the texture/structure screen of the
    feature-matching front end (photos of scenes score hundreds,
    flat fills and pure gradients zero).

    Scale shape: map-ONLY actor-pool pass, decode fused with Sobel +
    summed-area structure tensors + sparse NMS; payloads consumed
    in-stage, three int64s + metadata leave per image.  Oracle:
    golden recompute with a padded-array vectorized NMS (vs the
    engine's sparse per-candidate loop) — different evaluation path,
    identical integers.

    Output: (image_id, fmt, ok, n_corners, max_r20, sum_gx2).
    """
    from ..stages import media

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(
        media.HarrisCorners, batch_format="pyarrow", batch_size=128, concurrency=(1, 8)
    )


def image_border_detect(sf_dir: str) -> rd.Dataset:
    """Per-image uniform-border census (stages.media.BorderDetect):
    letterbox/pillarbox/scan-margin detection with a crop suggestion —
    the free-pixel audit run before any training crop (a border-heavy
    corpus wastes resolution budget on constant pixels).

    Scale shape: map-ONLY actor-pool pass, decode fused with the
    inward edge scans; payloads consumed in-stage; five int64s +
    metadata leave per image.  Oracle: golden recompute scanning with
    cumulative-uniformity prefix logic (vs the engine's while-loops).

    Output: (image_id, fmt, ok, top, bottom, left, right, n_px,
    border_frac).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.BorderDetect, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    # the fraction needs (w, h): join the metadata columns back in
    meta = read_images(sf_dir, columns=["image_id", "w", "h"])
    from ..stages.common import safe_join

    def meta_cols(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "mid": t["image_id"],
                "iw": pa.array(t["w"].to_numpy().astype(np.int64), type=pa.int64()),
                "ih": pa.array(t["h"].to_numpy().astype(np.int64), type=pa.int64()),
            }
        )

    joined = safe_join(
        scored,
        meta.map_batches(meta_cols, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("image_id",),
        right_on=("mid",),
    )

    def finish2(t: pa.Table) -> pa.Table:
        iw = t["iw"].to_numpy().astype(np.int64)
        ih = t["ih"].to_numpy().astype(np.int64)
        top = t["top"].to_numpy()
        bottom = t["bottom"].to_numpy()
        left = t["left"].to_numpy()
        right = t["right"].to_numpy()
        inner = np.maximum(ih - top - bottom, 0) * np.maximum(iw - left - right, 0)
        border = ih * iw - inner
        bf = duckdb_round(border.astype(np.float64) / np.maximum(ih * iw, 1).astype(np.float64), 6)
        return pa.table(
            {
                "image_id": t["image_id"],
                "fmt": t["fmt"],
                "ok": t["ok"],
                "top": t["top"],
                "bottom": t["bottom"],
                "left": t["left"],
                "right": t["right"],
                "n_px": t["n_px"],
                "border_frac": pa.array(bf, type=pa.float64()),
            }
        )

    return joined.map_batches(finish2, batch_format="pyarrow")


def image_hough_lines(sf_dir: str) -> rd.Dataset:
    """Per-image Hough line census (stages.media.HoughLines): how many
    (theta, rho) cells collect enough collinear edge votes — the
    line-dominance screen separating documents/architecture/renders
    from natural texture, beside Harris corners (point structure) and
    the orientation histogram (direction distribution).

    Scale shape: map-ONLY actor-pool pass; the vote loop is
    theta-bounded (16 bincounts over edge pixels — vectorized inner);
    payloads consumed in-stage, three int64s + metadata per image.
    Oracle: golden recompute accumulating a FULL 2-D (theta, rho)
    matrix per image (vs the engine's per-theta bincounts).

    Output: (image_id, fmt, ok, n_edge_px, n_lines, best_votes).
    """
    from ..stages import media

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    return ds.map_batches(
        media.HoughLines, batch_format="pyarrow", batch_size=128, concurrency=(1, 8)
    )


def image_glcm(sf_dir: str) -> rd.Dataset:
    """Per-image GLCM texture census (stages.media.GLCMTexture):
    Haralick contrast / energy / diagonal mass over the 16-level
    horizontal co-occurrence matrix — the between-pixels structure
    view the histogram, gradient and frequency audits miss.

    Scale shape: map-ONLY actor-pool pass, decode fused with the
    integer co-occurrence accumulation; payloads consumed in-stage,
    four int64s + metadata + one rounded ratio per image.  Oracle:
    golden recompute accumulating the GLCM with a bincount over
    packed (a*16+b) keys (vs the engine's 2-D add.at).

    Output: (image_id, fmt, ok, n_pairs, contrast, energy, n_diag,
    homogeneity_ratio = n_diag / n_pairs rounded 6).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt"])
    scored = ds.map_batches(
        media.GLCMTexture, batch_format="pyarrow", batch_size=256, concurrency=(1, 8)
    )

    def finish(t: pa.Table) -> pa.Table:
        hr = duckdb_round(
            t["n_diag"].to_numpy().astype(np.float64)
            / np.maximum(t["n_pairs"].to_numpy().astype(np.float64), 1.0),
            6,
        )
        return t.append_column("homogeneity_ratio", pa.array(hr, type=pa.float64()))

    return scored.map_batches(finish, batch_format="pyarrow")


def caption_complexity_corr(sf_dir: str) -> rd.Dataset:
    """Cross-modal audit: Pearson correlation between CAPTION length
    (tokens) and IMAGE visual complexity (thresholded edge-pixel
    count, stages.media.EdgeDensity) — do longer captions accompany
    busier images?  A captioned corpus where description length is
    independent of visual content smells of templated captions; a
    strong positive correlation is the healthy signature
    (caption_geo_alignment's sibling on the text-vs-pixels axis).

    Exactness: both variables are exact int64 (token count via
    single-space split; edge census integer); the moment partials and
    the mirrored r expression follow value_hour_correlation verbatim.

    Scale shape: ONE actor-pool decode pass fused with the edge
    census AND the caption tokenization (both columns ride the same
    batch — no join at all); six int64s per batch leave the task.
    Output: one row (n_images, pearson_r).
    """
    from ..stages import media
    from ..stages.common import duckdb_round

    ds = read_images(sf_dir, columns=["image_id", "bytes", "w", "h", "fmt", "caption"])

    class Fused:
        def __init__(self):
            self.edge = media.EdgeDensity()

        def __call__(self, t: pa.Table) -> pa.Table:
            scored = self.edge(t.select(["image_id", "bytes", "w", "h", "fmt"]))
            x = scored["n_edge"].to_numpy().astype(np.int64)
            cap = t["caption"].to_pylist()
            y = np.array([len(c.split(" ")) for c in cap], dtype=np.int64)
            vals = {
                "n": len(x),
                "sx": int(x.sum()),
                "sy": int(y.sum()),
                "sxy": int((x * y).sum()),
                "sxx": int((x * x).sum()),
                "syy": int((y * y).sum()),
            }
            return pa.table(
                {"_g": pa.array([0], type=pa.int64())}
                | {k: pa.array([v], type=pa.int64()) for k, v in vals.items()}
            )

    agg = (
        ds.map_batches(Fused, batch_format="pyarrow", batch_size=256, concurrency=(1, 8))
        .groupby("_g")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "sx", "sy", "sxy", "sxx", "syy")])
        .to_pandas()  # bounded: single-group moment rows
    )
    n, sx, sy, sxy, sxx, syy = (float(int(agg[c][0])) for c in ("n", "sx", "sy", "sxy", "sxx", "syy"))
    r = (n * sxy - sx * sy) / (np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy))
    return rd.from_arrow(
        pa.table(
            {
                "n_images": pa.array([int(n)], type=pa.int64()),
                "pearson_r": pa.array(duckdb_round(np.array([r]), 6), type=pa.float64()),
            }
        )
    )
