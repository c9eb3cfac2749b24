"""Deterministic synthetic fixture world (see FIXTURES.md).

Everything here is a pure function of (seed, scale).  Two families:

1. **Oracle-checkable derivations** — lon/lat/phash derived from integer
   ids by *polynomial integer/double arithmetic only* (no trig, no
   hashing), so the exact same values are computable in DuckDB SQL
   (plasmap_ray.oracle builds the SQL mirror).  IEEE-754 doubles make
   ``a + (m / 2^k) * span`` bit-identical between NumPy and DuckDB,
   which makes floor/cell/tile assignments integer-exact across engines.

2. **Rich geometry world** — polygonal cities assembled from unclosed
   ways (ring assembly), holes, fuzzy-containment districts; mirrors the
   reference's Essen/Duisburg/Muehlheim golden corpus
   (util/src/test/resources/{city,districts}.*.geojson, QueriesSpec.scala:44-175).
   Verified by pytest against construction-time ground truth, not SQL.

World bbox: lon in [6.0, 8.0], lat in [50.5, 52.0] (a Ruhr-like patch,
matching the reference corpus' region).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import geometry

SEED = 42
LON_MIN, LAT_MIN, LON_MAX, LAT_MAX = 6.0, 50.5, 8.0, 52.0
LON_SPAN = LON_MAX - LON_MIN  # 2.0
LAT_SPAN = LAT_MAX - LAT_MIN  # 1.5

# Weyl/LCG-style integer mixes.  Multipliers fit products in int64 for
# ids up to ~2^31 (id * 2654435761 < 2^63 for id < 3.4e9).
LON_MULT = 2654435761
LAT_MULT = 1103515245
LAT_ADD = 12345
POI_LON_MULT = 2246822519
POI_LAT_MULT = 3266489917
PHASH_MULT = 2654435761
PHASH_ADD = 40503

M32 = 1 << 32
M31 = 1 << 31
M62 = 1 << 62


def derive_lon(ids) -> np.ndarray:
    """id -> deterministic lon in [LON_MIN, LON_MAX) (SQL-mirrored)."""
    m = (np.asarray(ids, dtype=np.int64) * LON_MULT) % M32
    return LON_MIN + (m / M32) * LON_SPAN


def derive_lat(ids) -> np.ndarray:
    m = (np.asarray(ids, dtype=np.int64) * LAT_MULT + LAT_ADD) % M31
    return LAT_MIN + (m / M31) * LAT_SPAN


def derive_phash(ids) -> np.ndarray:
    """Synthetic 62-bit 'phash' for relational dedup queries (SQL-mirrored)."""
    return (np.asarray(ids, dtype=np.int64) * PHASH_MULT + PHASH_ADD) % M62


# ---------------------------------------------------------------------------
# Admin-boundary rectangles (oracle-checkable world)
# ---------------------------------------------------------------------------
# Three disjoint "cities" (admin_level=6) each subdivided into a 3x2 grid
# of districts (admin_level=8).  Rectangles so containment is expressible
# in ANSI SQL; the engine still runs its general polygon PiP path on them.
# ~20% of derived points fall outside every city -> inner-join drops
# (reference drop semantics, SURVEY.md §2.4).

_CITIES = [
    # (rel_id, name, lon0, lat0, lon1, lat1)
    (100, "Essenheim", 6.20, 50.70, 6.90, 51.30),
    (200, "Duisheim", 7.00, 50.80, 7.60, 51.40),
    (300, "Muehltal", 6.30, 51.40, 7.00, 51.90),
]
_DISTRICT_GRID = (3, 2)  # 3 cols x 2 rows per city


def admin_rects() -> list[dict]:
    """All admin rectangles: 3 cities + 18 districts, with rel_id/name/level."""
    out = []
    for rel_id, name, lon0, lat0, lon1, lat1 in _CITIES:
        out.append(
            dict(rel_id=rel_id, name=name, admin_level=6, lon_min=lon0, lat_min=lat0, lon_max=lon1, lat_max=lat1)
        )
        cols, rows = _DISTRICT_GRID
        dlon = (lon1 - lon0) / cols
        dlat = (lat1 - lat0) / rows
        k = 0
        for r in range(rows):
            for c in range(cols):
                k += 1
                out.append(
                    dict(
                        rel_id=rel_id + k,
                        name=f"{name}-d{k}",
                        admin_level=8,
                        lon_min=lon0 + c * dlon,
                        lat_min=lat0 + r * dlat,
                        lon_max=lon0 + (c + 1) * dlon,
                        lat_max=lat0 + (r + 1) * dlat,
                    )
                )
    return out


def admin_polygons() -> list[dict]:
    """Admin rectangles as closed polygon rings for the generic PiP path.

    Half-open semantics: a point on the max-lon/max-lat edge belongs to
    the next rectangle (mirrored by SQL's ``>= min AND < max``).
    """
    polys = []
    for r in admin_rects():
        ring = np.array(
            [
                [r["lon_min"], r["lat_min"]],
                [r["lon_max"], r["lat_min"]],
                [r["lon_max"], r["lat_max"]],
                [r["lon_min"], r["lat_max"]],
            ]
        )
        polys.append(
            dict(rel_id=r["rel_id"], name=r["name"], admin_level=r["admin_level"], outer=ring, holes=[], bbox=(r["lon_min"], r["lat_min"], r["lon_max"], r["lat_max"]))
        )
    return polys


# ---------------------------------------------------------------------------
# POI table (kNN / tag-query fixtures)
# ---------------------------------------------------------------------------
# (key, value) vocabulary drawn from the reference's POI registry
# (query-engine/src/main/scala/io/plasmap/query/engine/POIs.scala:42-253).

POI_KINDS = [
    ("amenity", "restaurant"),
    ("amenity", "theatre"),
    ("amenity", "bar"),
    ("amenity", "cafe"),
    ("amenity", "pub"),
    ("amenity", "fast_food"),
    ("amenity", "library"),
    ("amenity", "hospital"),
    ("amenity", "pharmacy"),
    ("amenity", "school"),
    ("amenity", "university"),
    ("amenity", "parking"),
    ("amenity", "fuel"),
    ("amenity", "bank"),
    ("shop", "supermarket"),
    ("shop", "bakery"),
    ("shop", "butcher"),
    ("leisure", "park"),
    ("leisure", "sports_centre"),
    ("tourism", "hotel"),
]
N_POIS = 500


def derive_poi_lon(ids) -> np.ndarray:
    m = (np.asarray(ids, dtype=np.int64) * POI_LON_MULT) % M32
    return LON_MIN + (m / M32) * LON_SPAN


def derive_poi_lat(ids) -> np.ndarray:
    m = (np.asarray(ids, dtype=np.int64) * POI_LAT_MULT) % M32
    return LAT_MIN + (m / M32) * LAT_SPAN


def make_pois(n: int = N_POIS) -> pa.Table:
    """Deterministic POI node table (poi_id, lon, lat, key, value, name)."""
    ids = np.arange(1, n + 1, dtype=np.int64)
    kind_idx = (ids % len(POI_KINDS)).astype(np.int64)
    keys = [POI_KINDS[i][0] for i in kind_idx]
    values = [POI_KINDS[i][1] for i in kind_idx]
    return pa.table(
        {
            "poi_id": ids,
            "lon": derive_poi_lon(ids),
            "lat": derive_poi_lat(ids),
            "key": pa.array(keys, type=pa.string()),
            "value": pa.array(values, type=pa.string()),
            "name": pa.array([f"poi-{i}" for i in ids], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# Rich polygon world (ring assembly / holes / fuzzy-within) — pytest only
# ---------------------------------------------------------------------------


def _regular_ring(cx: float, cy: float, r: float, n: int, phase: float = 0.0) -> np.ndarray:
    ang = phase + np.arange(n) * (2 * np.pi / n)
    return np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])


def boundary_world() -> dict:
    """Synthetic OSM-style normalized tables + golden assembled boundaries.

    Returns dict with pyarrow tables ``nodes``, ``ways``, ``relations``
    and golden data ``boundaries`` (list of polygon dicts) plus the
    construction-time ``containment`` truth table, including the two
    fuzzy-threshold districts (~92% in, ~80% out) reproducing
    GeoCalculatorSpec.scala:88-98.
    """
    node_rows: list[tuple[int, float, float]] = []
    way_rows: list[tuple[int, list[int]]] = []
    rel_rows: list[dict] = []
    boundaries: list[dict] = []
    containment: list[tuple[int, int, bool]] = []  # (inner_rel, outer_rel, within)

    next_node = [1]
    next_way = [1]

    def add_ring_as_ways(ring: np.ndarray, n_ways: int) -> list[int]:
        """Split a closed ring into ``n_ways`` unclosed chained ways."""
        n = ring.shape[0]
        ids = []
        for i in range(n):
            node_rows.append((next_node[0] + i, float(ring[i, 0]), float(ring[i, 1])))
        base = next_node[0]
        next_node[0] += n
        # way k covers vertex indices [k*step .. (k+1)*step] inclusive (wrap)
        bounds = np.linspace(0, n, n_ways + 1).astype(int)
        for k in range(n_ways):
            lo, hi = bounds[k], bounds[k + 1]
            nds = [base + (j % n) for j in range(lo, hi + 1)]
            way_rows.append((next_way[0], nds))
            ids.append(next_way[0])
            next_way[0] += 1
        return ids

    # City P: convex octagon with a square hole, assembled from 4 outer ways
    city_p_outer = _regular_ring(6.55, 51.00, 0.28, 8, phase=0.1)
    city_p_hole = _regular_ring(6.55, 51.00, 0.05, 4, phase=0.3)
    outer_ids = add_ring_as_ways(city_p_outer, 4)
    hole_ids = add_ring_as_ways(city_p_hole, 2)
    rel_rows.append(
        dict(
            rel_id=1000,
            name="Polyessen",
            admin_level=6,
            members=[("way", w, "outer") for w in outer_ids] + [("way", w, "inner") for w in hole_ids],
        )
    )
    boundaries.append(dict(rel_id=1000, name="Polyessen", admin_level=6, outer=city_p_outer, holes=[city_p_hole]))

    # City Q: irregular convex hexagon, 3 outer ways, no hole
    city_q_outer = _regular_ring(7.35, 51.55, 0.22, 6, phase=0.5)
    q_ids = add_ring_as_ways(city_q_outer, 3)
    rel_rows.append(dict(rel_id=2000, name="Polyduis", admin_level=6, members=[("way", w, "outer") for w in q_ids]))
    boundaries.append(dict(rel_id=2000, name="Polyduis", admin_level=6, outer=city_q_outer, holes=[]))

    # Districts of city P: small hexagons fully inside (avoiding the hole)
    offsets = [(-0.13, -0.10), (0.13, -0.10), (-0.13, 0.10), (0.13, 0.10)]
    for i, (dx, dy) in enumerate(offsets, start=1):
        ring = _regular_ring(6.55 + dx, 51.00 + dy, 0.045, 6, phase=0.2)
        wids = add_ring_as_ways(ring, 2)
        rid = 1000 + i
        rel_rows.append(
            dict(rel_id=rid, name=f"Polyessen-d{i}", admin_level=8, members=[("way", w, "outer") for w in wids])
        )
        boundaries.append(dict(rel_id=rid, name=f"Polyessen-d{i}", admin_level=8, outer=ring, holes=[]))
        containment.append((rid, 1000, True))
        containment.append((rid, 2000, False))

    # Fuzzy districts near city Q's border: shift a hexagon outward so a
    # known fraction of its area leaves the city.  Fractions verified at
    # generation time with the exact convex clip.
    def fuzzy_district(rid: int, name: str, frac_target: tuple[float, float], shift: float) -> None:
        # hexagon straddling city Q's right edge
        cx = 7.35 + shift
        ring = _regular_ring(cx, 51.55, 0.06, 6, phase=0.0)
        inter = geometry.intersection_area(ring, city_q_outer)
        frac = inter / geometry.polygon_area(ring)
        lo, hi = frac_target
        assert lo <= frac <= hi, f"{name}: overlap {frac:.3f} not in [{lo},{hi}]"
        wids = add_ring_as_ways(ring, 2)
        rel_rows.append(dict(rel_id=rid, name=name, admin_level=8, members=[("way", w, "outer") for w in wids]))
        boundaries.append(dict(rel_id=rid, name=name, admin_level=8, outer=ring, holes=[]))
        containment.append((rid, 2000, frac >= 0.9))

    # ~93% inside -> fuzzy-within true; ~84% inside -> false
    fuzzy_district(2001, "Polyduis-fuzzy-in", (0.905, 0.96), shift=0.150)
    fuzzy_district(2002, "Polyduis-fuzzy-out", (0.70, 0.885), shift=0.160)

    # City R: exercises the NON-way member types of relation assembly
    # (RelationFlow.scala:43-49 partitions members into node / way /
    # relation geometry maps).  rel 3100 is a standalone exclave ring;
    # rel 3000 references it as a RELATION member (one-level recursion),
    # plus a NODE member carrying the 'admin_centre' role.
    exclave_ring = _regular_ring(7.70, 50.70, 0.04, 6, phase=0.25)
    exclave_ids = add_ring_as_ways(exclave_ring, 2)
    rel_rows.append(
        dict(rel_id=3100, name="Polymulti-exclave", admin_level=8, members=[("way", w, "outer") for w in exclave_ids])
    )
    boundaries.append(dict(rel_id=3100, name="Polymulti-exclave", admin_level=8, outer=exclave_ring, holes=[]))

    city_r_outer = _regular_ring(7.60, 51.20, 0.15, 6, phase=0.4)
    r_ids = add_ring_as_ways(city_r_outer, 2)
    centre_node = next_node[0]
    node_rows.append((centre_node, 7.60, 51.20))
    next_node[0] += 1
    rel_rows.append(
        dict(
            rel_id=3000,
            name="Polymulti",
            admin_level=6,
            members=[("way", w, "outer") for w in r_ids]
            + [("node", centre_node, "admin_centre")]
            + [("relation", 3100, "outer")],
        )
    )
    boundaries.append(
        dict(
            rel_id=3000,
            name="Polymulti",
            admin_level=6,
            outer=city_r_outer,
            holes=[],
            points=[("admin_centre", 7.60, 51.20)],
            extra_outers=[exclave_ring],
        )
    )

    nodes = pa.table(
        {
            "node_id": pa.array([r[0] for r in node_rows], type=pa.int64()),
            "lon": pa.array([r[1] for r in node_rows], type=pa.float64()),
            "lat": pa.array([r[2] for r in node_rows], type=pa.float64()),
        }
    )
    ways = pa.table(
        {
            "way_id": pa.array([r[0] for r in way_rows], type=pa.int64()),
            "nds": pa.array([r[1] for r in way_rows], type=pa.list_(pa.int64())),
        }
    )
    relations = pa.table(
        {
            "rel_id": pa.array([r["rel_id"] for r in rel_rows], type=pa.int64()),
            "name": pa.array([r["name"] for r in rel_rows], type=pa.string()),
            "admin_level": pa.array([r["admin_level"] for r in rel_rows], type=pa.int32()),
            "members": pa.array(
                [[{"type": t, "ref": w, "role": role} for (t, w, role) in r["members"]] for r in rel_rows],
                type=pa.list_(pa.struct([("type", pa.string()), ("ref", pa.int64()), ("role", pa.string())])),
            ),
        }
    )
    return dict(nodes=nodes, ways=ways, relations=relations, boundaries=boundaries, containment=containment)


# ---------------------------------------------------------------------------
# Images table — exact driver input_hint shape
# (image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
#  caption:string, phash:int64)
# ---------------------------------------------------------------------------

from . import codecs as _codecs  # noqa: E402

_SIZE_CHOICES = (16, 32, 64)
_FMT_CYCLE = ("raw", "pngz", "qnt8")
NEAR_DUP_STRIDE = 97  # every 97th image duplicates its predecessor's pixels


# per-(w,h) normalized coordinate grids, cached: they are identical for
# every image of a size, and regenerating them dominates the generator's
# memory traffic at bench scale (values unchanged -> outputs unchanged)
_GRID_CACHE: dict[tuple[int, int], tuple["np.ndarray", "np.ndarray"]] = {}


def _uv_grid(w: int, h: int) -> tuple["np.ndarray", "np.ndarray"]:
    key = (w, h)
    got = _GRID_CACHE.get(key)
    if got is None:
        yy, xx = np.mgrid[0:h, 0:w]
        got = (xx / max(w - 1, 1), yy / max(h - 1, 1))
        _GRID_CACHE[key] = got
    return got


def _image_pixels(i: int, w: int, h: int, seed: int) -> "np.ndarray":
    """Procedural RGB image: per-image low-frequency sinusoid pattern +
    seeded noise.  The pattern's frequencies/phases are image-specific so
    perceptual hashes are DIVERSE (a fixed gradient would make every
    image's 8x8 block-mean hash collide); only deliberately planted
    near-dups share a phash."""
    rng = np.random.default_rng(seed * 1_000_003 + i)
    u, v = _uv_grid(w, h)
    # in-place formulation of 127 + amp*sin(2π(fx·u + fy·v) + phase) + noise:
    # identical float64 operations in the same order (mult commutes, int
    # adds exact) -> byte-identical pixels, ~half the temporaries.
    # The 9 per-channel uniform() draws are ONE random(12) call scaled
    # by hand with uniform()'s exact expression (low + (high-low)*r over
    # the same 12-double PCG stream) — byte-identical values, ~15us less
    # per-image Generator dispatch (the flagship regen is the bench's
    # hottest loop); clip is the two in-place ufuncs (np.clip's wrapper
    # re-checks errstate per call).
    r12 = rng.random(12)
    base = np.empty((h, w, 3), dtype=np.float64)
    for c in range(3):
        fx = 0.5 + 3.0 * r12[4 * c]
        fy = 0.5 + 3.0 * r12[4 * c + 1]
        phase = 2 * np.pi * r12[4 * c + 2]
        amp = 60.0 + 50.0 * r12[4 * c + 3]
        arg = fx * u
        arg += fy * v
        arg *= 2 * np.pi
        arg += phase
        np.sin(arg, out=arg)
        arg *= amp
        arg += 127.0
        base[:, :, c] = arg
    noise = rng.integers(-20, 21, size=(h, w, 3))
    base += noise
    np.maximum(base, 0.0, out=base)
    np.minimum(base, 255.0, out=base)
    return base.astype(np.uint8)


def district_name_for(lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
    """Ground-truth admin_level=8 district name per point ('' if none)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    out = np.full(lon.shape[0], "", dtype=object)
    for r in admin_rects():
        if r["admin_level"] != 8:
            continue
        m = (lon >= r["lon_min"]) & (lon < r["lon_max"]) & (lat >= r["lat_min"]) & (lat < r["lat_max"])
        out[m] = r["name"]
    return out


def make_images(
    n: int,
    seed: int = SEED,
    size_choices: tuple[int, ...] = _SIZE_CHOICES,
    skew_hot_frac: float = 0.0,
) -> pa.Table:
    """Deterministic images table of ``n`` rows (ids 1..n).

    - position derived from the row ordinal by :func:`derive_lon`/`derive_lat`
      (so spatial joins are oracle-checkable);
    - caption references the ground-truth containing district, making
      caption equality double as a join check (FIXTURES.md §1);
    - every ``NEAR_DUP_STRIDE``-th row reuses the previous row's pixels
      (planted exact-pixel near-dups -> equal phash);
    - ``skew_hot_frac`` relocates that fraction of rows into one hot
      ~20 km cell (district Essenheim-d1 corner) to exercise salting.
    """
    ids = np.arange(1, n + 1, dtype=np.int64)
    lon = derive_lon(ids)
    lat = derive_lat(ids)
    if skew_hot_frac > 0.0:
        hot = (ids % np.int64(round(1.0 / skew_hot_frac))) == 0
        # concentrate into a ~0.15 x 0.1 deg box inside Essenheim
        lon = np.where(hot, 6.25 + (lon - LON_MIN) / LON_SPAN * 0.15, lon)
        lat = np.where(hot, 50.75 + (lat - LAT_MIN) / LAT_SPAN * 0.10, lat)
    district = district_name_for(lon, lat)
    kind_idx = (ids % len(POI_KINDS)).astype(np.int64)

    sizes = np.array(size_choices, dtype=np.int64)
    w = sizes[(ids * 7) % len(sizes)].astype(np.int32)
    h = sizes[(ids * 11) % len(sizes)].astype(np.int32)

    payloads: list[bytes] = []
    phashes = np.empty(n, dtype=np.int64)
    captions: list[str] = []
    fmts: list[str] = []
    prev_pixels = None
    for j, i in enumerate(ids):
        i = int(i)
        fmt = _FMT_CYCLE[i % len(_FMT_CYCLE)]
        if j > 0 and i % NEAR_DUP_STRIDE == 0:
            pixels = prev_pixels
            w[j] = w[j - 1]
            h[j] = h[j - 1]
        else:
            pixels = _image_pixels(i, int(w[j]), int(h[j]), seed)
        prev_pixels = pixels
        payloads.append(_codecs.encode_image(pixels, fmt))
        phashes[j] = _codecs.phash64(pixels)
        fmts.append(fmt)
        kind = POI_KINDS[int(kind_idx[j])][1]
        where = district[j] if district[j] else "the countryside"
        captions.append(f"a photo of {kind} in {where}")

    return pa.table(
        {
            "image_id": pa.array([f"img-{int(i):012d}" for i in ids], type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array(w, type=pa.int32()),
            "h": pa.array(h, type=pa.int32()),
            "fmt": pa.array(fmts, type=pa.string()),
            "caption": pa.array(captions, type=pa.string()),
            "phash": pa.array(phashes, type=pa.int64()),
        }
    )


def reference_pixels_int(i: int, w: int, h: int, seed: int = SEED) -> "np.ndarray":
    """Integer-id fast path of :func:`reference_pixels` — the flagship
    kernel already holds parsed int64 ids, so the string format/split
    round trip is pure overhead in the hottest loop."""
    if i > 1 and i % NEAR_DUP_STRIDE == 0:
        i -= 1
    return _image_pixels(i, w, h, seed)


def reference_pixels(image_id: str, w: int, h: int, seed: int = SEED) -> "np.ndarray":
    """Regenerate the golden pixels for an image id (fidelity oracle).

    Near-dup rows (id % NEAR_DUP_STRIDE == 0) reuse predecessor pixels.
    """
    return reference_pixels_int(int(image_id.split("-")[1]), w, h, seed)


def images_parquet_path(n: int, seed: int = SEED, skew_hot_frac: float = 0.0, root: str = "/tmp/plasmap_fixtures") -> str:
    """Write-once cache of the images table as parquet; returns the path."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    tag = f"images_v2_n{n}_s{seed}" + (f"_hot{skew_hot_frac}" if skew_hot_frac else "")
    path = os.path.join(root, tag + ".parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"  # per-PID: concurrent builders must not share a temp name
        pq.write_table(make_images(n, seed=seed, skew_hot_frac=skew_hot_frac), tmp)
        os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# Audio / video tables (multimodal payload fixtures)
# ---------------------------------------------------------------------------
# Audio payloads are REAL RIFF/WAV PCM16 files (stdlib `wave` container;
# media.decode_wav_pcm16 parses them back).  Video payloads are raw
# frame-packed RGB (w*h*3 bytes per frame) — the layout VideoFrameSample
# slices without any codec.


def make_audio(n: int) -> pa.Table:
    import io
    import wave

    ids = np.arange(1, n + 1, dtype=np.int64)
    rows_bytes: list[bytes] = []
    srs = np.where(ids % 2 == 0, 16000, 8000).astype(np.int32)
    n_samps = (srs // 4 + (ids % 5) * (srs // 16)).astype(np.int64)
    for i, sr, ns in zip(ids, srs, n_samps):
        f0 = 200.0 + (int(i) * 37) % 1800
        t = np.arange(int(ns)) / int(sr)
        s = 0.6 * np.sin(2 * np.pi * f0 * t) + 0.25 * np.sin(2 * np.pi * 2.5 * f0 * t + 1.0)
        s16 = np.clip(np.round(s * 32767.0), -32768, 32767).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(2)
            wf.setframerate(int(sr))
            wf.writeframes(s16.tobytes())
        rows_bytes.append(buf.getvalue())
    return pa.table(
        {
            "media_id": pa.array([f"au-{int(i):08d}" for i in ids], type=pa.string()),
            "bytes": pa.array(rows_bytes, type=pa.binary()),
            "sample_rate": pa.array(srs, type=pa.int32()),
            "n_samples": pa.array(n_samps, type=pa.int64()),
            "fmt": pa.array(["wav-pcm16"] * n, type=pa.string()),
        }
    )


def make_video(n: int) -> pa.Table:
    ids = np.arange(1, n + 1, dtype=np.int64)
    ws = np.where(ids % 3 == 0, 16, 8).astype(np.int32)
    n_frames = (4 + ids % 5).astype(np.int32)
    payloads: list[bytes] = []
    for i, w, nf in zip(ids, ws, n_frames):
        w = int(w)
        frames = []
        yy, xx = np.mgrid[0:w, 0:w]
        for f in range(int(nf)):
            # per-frame deterministic gradient pattern, id/f dependent
            base = (xx * 7 + yy * 13 + int(i) * 31 + f * 17) % 256
            frames.append(np.stack([base, (base * 2) % 256, (base * 3) % 256], axis=2).astype(np.uint8).tobytes())
        payloads.append(b"".join(frames))
    return pa.table(
        {
            "media_id": pa.array([f"vid-{int(i):08d}" for i in ids], type=pa.string()),
            "bytes": pa.array(payloads, type=pa.binary()),
            "w": pa.array(ws, type=pa.int32()),
            "h": pa.array(ws, type=pa.int32()),
            "n_frames": pa.array(n_frames, type=pa.int32()),
            "fmt": pa.array(["fake-raw"] * n, type=pa.string()),
        }
    )


def media_parquet_path(kind: str, n: int, root: str = "/tmp/plasmap_fixtures") -> str:
    """Write-once cache for the audio/video fixture tables."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"{kind}_v1_n{n}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"  # per-PID: concurrent builders must not share a temp name
        pq.write_table(make_audio(n) if kind == "audio" else make_video(n), tmp)
        os.replace(tmp, path)
    return path


# ---------------------------------------------------------------------------
# Embeddings with PLANTED near-duplicates (LSH recall fixtures)
# ---------------------------------------------------------------------------
# The driver's embeddings.parquet has no true near-dups (max cosine
# ~0.48), which is the wrong regime for LSH recall measurement; this
# corpus plants perturbed copies at cosine >= ~0.98.


def make_embeddings(n: int = 400, dim: int = 32, dup_every: int = 10, seed: int = 123) -> pa.Table:
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    for i in range(dup_every, n, dup_every):
        m[i] = m[i - 1] + 0.08 * rng.standard_normal(dim)  # cosine ~0.99 vs predecessor
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array([row.astype(np.float32) for row in m], type=pa.list_(pa.float32())),
        }
    )


def embeddings_parquet_path(
    n: int = 400, dim: int = 32, dup_every: int = 10, seed: int = 123, root: str = "/tmp/plasmap_fixtures"
) -> str:
    import os

    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    path = os.path.join(root, f"embdup_n{n}_d{dim}_e{dup_every}_s{seed}.parquet")
    if not os.path.exists(path):
        tmp = f"{path}.tmp.{os.getpid()}"  # per-PID: concurrent builders must not share a temp name
        pq.write_table(make_embeddings(n, dim, dup_every, seed), tmp)
        os.replace(tmp, path)
    return path


def make_images_range(lo: int, hi: int, seed: int = SEED, size_choices: tuple[int, ...] = _SIZE_CHOICES) -> pa.Table:
    """Rows [lo, hi) of the images table (see make_images_for_ids)."""
    return make_images_for_ids(np.arange(lo, hi, dtype=np.int64), seed=seed, size_choices=size_choices)


def make_images_for_ids(
    ids: "np.ndarray",
    seed: int = SEED,
    size_choices: tuple[int, ...] = _SIZE_CHOICES,
    with_ref_crc: bool = False,
) -> pa.Table:
    """Images-table rows for arbitrary ids — the stateless shard form of
    :func:`make_images` (identical rows), usable from parallel Ray tasks.
    The near-dup rule (id %% NEAR_DUP_STRIDE == 0 copies id-1's pixels)
    is honored statelessly by regenerating the predecessor's pixels.

    ``with_ref_crc`` appends two production-provenance columns the
    bench table carries (sf fixture tables keep the reference's
    7-column schema):
    - ``ref_crc:int64`` = crc32 of the REFERENCE pixel bytes — the
      stored digest that verifies a lossless decode without
      regenerating or re-reading the original;
    - ``ref_bytes:binary`` = the zlib'd reference pixels for LOSSY
      rows only (empty for lossless rows, whose payload IS the
      reference) — the stored lossless master a production pipeline
      reads to compute a LIVE PSNR against, instead of regenerating
      the original from its generative seed (~40 KB of float64 DRAM
      traffic per 768 B image)."""
    import zlib as _zlib

    ids = np.asarray(ids, dtype=np.int64)
    n = len(ids)
    lon = derive_lon(ids)
    lat = derive_lat(ids)
    district = district_name_for(lon, lat)
    kind_idx = (ids % len(POI_KINDS)).astype(np.int64)
    sizes = np.array(size_choices, dtype=np.int64)
    w = sizes[(ids * 7) % len(sizes)].astype(np.int32)
    h = sizes[(ids * 11) % len(sizes)].astype(np.int32)

    payloads: list[bytes] = []
    phashes = np.empty(n, dtype=np.int64)
    ref_crcs = np.empty(n, dtype=np.int64)
    ref_bytes: list[bytes] = []
    captions: list[str] = []
    fmts: list[str] = []
    for j in range(n):
        i = int(ids[j])
        fmt = _FMT_CYCLE[i % len(_FMT_CYCLE)]
        if i > 1 and i % NEAR_DUP_STRIDE == 0:
            src = i - 1
            w[j] = sizes[(src * 7) % len(sizes)]
            h[j] = sizes[(src * 11) % len(sizes)]
            pixels = _image_pixels(src, int(w[j]), int(h[j]), seed)
        else:
            pixels = _image_pixels(i, int(w[j]), int(h[j]), seed)
        payloads.append(_codecs.encode_image(pixels, fmt))
        phashes[j] = _codecs.phash64(pixels)
        ref_crcs[j] = _zlib.crc32(pixels)
        ref_bytes.append(_zlib.compress(pixels.tobytes(), 6) if fmt == "qnt8" else b"")
        fmts.append(fmt)
        kind = POI_KINDS[int(kind_idx[j])][1]
        where = district[j] if district[j] else "the countryside"
        captions.append(f"a photo of {kind} in {where}")

    cols = {
        "image_id": pa.array([f"img-{int(i):012d}" for i in ids], type=pa.string()),
        "bytes": pa.array(payloads, type=pa.binary()),
        "w": pa.array(w, type=pa.int32()),
        "h": pa.array(h, type=pa.int32()),
        "fmt": pa.array(fmts, type=pa.string()),
        "caption": pa.array(captions, type=pa.string()),
        "phash": pa.array(phashes, type=pa.int64()),
    }
    if with_ref_crc:
        cols["ref_crc"] = pa.array(ref_crcs, type=pa.int64())
        cols["ref_bytes"] = pa.array(ref_bytes, type=pa.binary())
    return pa.table(cols)


# ---------------------------------------------------------------------------
# Road network world (routing family)
# ---------------------------------------------------------------------------

ROAD_N = 24  # grid side: ROAD_N^2 nodes over the world bbox
ROAD_BASE_W = 1000  # minimum edge weight (fixed-point "cost" units)
ROAD_W_SPREAD = 977  # prime spread so weights are non-uniform


def road_world(n: int = ROAD_N) -> dict:
    """Deterministic road-grid network over the world bbox.

    An ``n x n`` lattice of nodes (4-neighbor connectivity) with
    non-uniform INTEGER edge weights derived from the canonical
    (src, dst) pair by a murmur-style integer mix — no floats anywhere
    in the cost model, so shortest-path distances are exact int64 sums
    regardless of relaxation order or engine.  Node ids are 1-based
    row-major: node (i, j) = j*n + i + 1; lon/lat place the lattice on
    the fixture world so routing results can join the geo layer.

    Returns ``{"nodes": Table(node_id, lon, lat, gx, gy),
    "edges": Table(src, dst, w), "n": n}``; edges are stored once per
    undirected pair (src < dst), symmetrize at use.
    """
    ids = np.arange(n * n, dtype=np.int64)
    gx = ids % n
    gy = ids // n
    node_id = ids + 1
    lon = LON_MIN + (gx.astype(np.float64) / (n - 1)) * LON_SPAN
    lat = LAT_MIN + (gy.astype(np.float64) / (n - 1)) * LAT_SPAN
    nodes = pa.table(
        {
            "node_id": pa.array(node_id, type=pa.int64()),
            "lon": pa.array(lon, type=pa.float64()),
            "lat": pa.array(lat, type=pa.float64()),
            "gx": pa.array(gx, type=pa.int64()),
            "gy": pa.array(gy, type=pa.int64()),
        }
    )
    right = node_id[gx < n - 1]
    up = node_id[gy < n - 1]
    src = np.concatenate([right, up])
    dst = np.concatenate([right + 1, up + n])
    key = src.astype(np.uint64) * np.uint64(2654435761) + dst.astype(np.uint64) * np.uint64(40503)
    key ^= key >> np.uint64(33)
    key *= np.uint64(0xFF51AFD7ED558CCD)
    key ^= key >> np.uint64(33)
    w = (np.int64(ROAD_BASE_W) + (key % np.uint64(ROAD_W_SPREAD)).astype(np.int64)).astype(np.int64)
    edges = pa.table(
        {
            "src": pa.array(src, type=pa.int64()),
            "dst": pa.array(dst, type=pa.int64()),
            "w": pa.array(w, type=pa.int64()),
        }
    )
    return {"nodes": nodes, "edges": edges, "n": n}
