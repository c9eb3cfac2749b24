"""SQL mirrors of the deterministic kernels — for the DuckDB oracle gate.

Every function returns an ANSI-SQL fragment that computes *exactly* the
same value as the corresponding NumPy kernel:

- position derivation (fixtures.derive_lon/derive_lat/...) is pure
  integer + double arithmetic -> bit-identical doubles across engines;
- Morton/cell math (cells.encode/reduce_precision) is integer-exact;
- slippy tile x (linear) is double->floor -> integer-exact; tile y uses
  trig, where libm ulp differences could flip a floor only for points
  within ~1 ulp of a tile boundary (measure-zero for the fixture mixes).

The driver compares query output against these mirrors at sf=0.01
(CORRECTNESS_r{N}.json), which makes the SQL here the independent
correctness oracle for the engine's spatial kernels.
"""

from __future__ import annotations

from . import fixtures

M32 = 1 << 32
M31 = 1 << 31
M62 = 1 << 62

_SPREAD_STEPS = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def sql_derive_lon(id_expr: str) -> str:
    return (
        f"({fixtures.LON_MIN} + (((({id_expr} * {fixtures.LON_MULT}) % {M32}) / {M32}) * {fixtures.LON_SPAN}))"
    )


def sql_derive_lat(id_expr: str) -> str:
    return (
        f"({fixtures.LAT_MIN} + (((({id_expr} * {fixtures.LAT_MULT} + {fixtures.LAT_ADD}) % {M31}) / {M31}) * {fixtures.LAT_SPAN}))"
    )


def sql_derive_phash(id_expr: str) -> str:
    return f"(({id_expr} * {fixtures.PHASH_MULT} + {fixtures.PHASH_ADD}) % {M62})"


def sql_grid_coord(value_expr: str, offset: float, span: float, precision: int) -> str:
    """floor((value+offset)/span * 2**p) clamped to [0, 2**p-1] as BIGINT."""
    n = 1 << precision
    return (
        f"CAST(least(greatest(floor((({value_expr} + {offset}) / {span}) * {n}), 0), {n - 1}) AS BIGINT)"
    )


def sql_morton_ctes(
    source_cte: str,
    key_cols: str,
    precision: int,
    out_col: str = "cell",
    lon_col: str = "lon",
    lat_col: str = "lat",
    prefix: str = "m",
) -> str:
    """CTE chain computing the Morton cell id from lon/lat columns.

    Appends CTEs named ``{prefix}_xy, {prefix}_s0..s4, {prefix}_out`` to
    a WITH list; select from ``{prefix}_out`` (has key_cols + out_col).
    """
    ctes = [
        f"{prefix}_xy AS (SELECT {key_cols}, "
        f"{sql_grid_coord(lon_col, 180.0, 360.0, precision)} AS mx, "
        f"{sql_grid_coord(lat_col, 90.0, 180.0, precision)} AS my FROM {source_cte})"
    ]
    prev = f"{prefix}_xy"
    for i, (shift, mask) in enumerate(_SPREAD_STEPS):
        name = f"{prefix}_s{i}"
        ctes.append(
            f"{name} AS (SELECT {key_cols}, "
            f"((mx | (mx << {shift})) & {mask}) AS mx, "
            f"((my | (my << {shift})) & {mask}) AS my FROM {prev})"
        )
        prev = name
    ctes.append(f"{prefix}_out AS (SELECT {key_cols}, (mx | (my << 1)) AS {out_col} FROM {prev})")
    return ",\n".join(ctes)


def sql_tile_x(lon_col: str, z: int) -> str:
    n = 1 << z
    return f"CAST(least(greatest(floor((({lon_col} + 180.0) / 360.0) * {n}), 0), {n - 1}) AS BIGINT)"


def sql_tile_y(lat_col: str, z: int) -> str:
    """Mercator tile row; lat pre-clamped to the Web-Mercator limit."""
    n = 1 << z
    lat = f"least(greatest({lat_col}, -85.05112878), 85.05112878)"
    merc = f"(1.0 - ln(tan(radians({lat})) + 1.0 / cos(radians({lat}))) / pi()) / 2.0"
    return f"CAST(least(greatest(floor({merc} * {n}), 0), {n - 1}) AS BIGINT)"


def sql_admin_rects_values(admin_level: int | None = None) -> str:
    """Inline VALUES table of the fixture admin rectangles.

    Columns: (rel_id, name, admin_level, lon_min, lat_min, lon_max, lat_max).
    """
    rows = []
    for r in fixtures.admin_rects():
        if admin_level is not None and r["admin_level"] != admin_level:
            continue
        rows.append(
            f"({r['rel_id']}, '{r['name']}', {r['admin_level']}, "
            f"{r['lon_min']!r}, {r['lat_min']!r}, {r['lon_max']!r}, {r['lat_max']!r})"
        )
    return (
        "(VALUES " + ", ".join(rows) + ") AS b(rel_id, name, admin_level, lon_min, lat_min, lon_max, lat_max)"
    )


def sql_derive_poi_lon(id_expr: str) -> str:
    return f"({fixtures.LON_MIN} + (((({id_expr} * {fixtures.POI_LON_MULT}) % {M32}) / {M32}) * {fixtures.LON_SPAN}))"


def sql_derive_poi_lat(id_expr: str) -> str:
    return f"({fixtures.LAT_MIN} + (((({id_expr} * {fixtures.POI_LAT_MULT}) % {M32}) / {M32}) * {fixtures.LAT_SPAN}))"


def sql_pois_values() -> str:
    """Inline table of the deterministic POI fixture (same rows as the
    Ray side's broadcast table).  Coordinates are DERIVED in SQL via
    the bit-exact integer mixes rather than embedded as decimal
    literals — a printed double can parse back to a different ulp."""
    t = fixtures.make_pois()
    rows = []
    for i in range(t.num_rows):
        rows.append(
            f"({t['poi_id'][i].as_py()}, '{t['key'][i].as_py()}', '{t['value'][i].as_py()}', '{t['name'][i].as_py()}')"
        )
    vals = "(VALUES " + ", ".join(rows) + ") AS p0(poi_id, key, value, name)"
    return (
        f"(SELECT poi_id, {sql_derive_poi_lon('poi_id')} AS lon, {sql_derive_poi_lat('poi_id')} AS lat, "
        f"key, value, name FROM {vals}) AS p"
    )


def sql_way_segments_values() -> str:
    """Inline VALUES table of the fixture-world way segments —
    identical rows (and row order) to pipelines.snap.way_segments().
    Coordinates are emitted as CAST('repr' AS DOUBLE): repr() is
    Python's shortest round-trip double literal, and the STRING cast
    goes through DuckDB's correctly-rounded string->double parser.  A
    bare numeric literal would be typed DECIMAL (ulp drift in
    arithmetic), and CAST(numeric-literal AS DOUBLE) still parses
    DECIMAL first, truncating 17-significant-digit values."""
    from .pipelines.snap import way_segments

    t = way_segments()
    rows = []
    for i in range(t.num_rows):
        rows.append(
            f"({t['way_id'][i].as_py()}, {t['seg_idx'][i].as_py()}, "
            f"CAST('{t['x1'][i].as_py()!r}' AS DOUBLE), CAST('{t['y1'][i].as_py()!r}' AS DOUBLE), "
            f"CAST('{t['x2'][i].as_py()!r}' AS DOUBLE), CAST('{t['y2'][i].as_py()!r}' AS DOUBLE))"
        )
    return "(VALUES " + ", ".join(rows) + ") AS s(way_id, seg_idx, x1, y1, x2, y2)"


def sql_sqdist_deg(lon_a: str, lat_a: str, lon_b: str, lat_b: str) -> str:
    """Planar squared distance in degrees — polynomial, hence bit-exact
    across engines (used for oracle-checked kNN ordering)."""
    return f"((({lon_a}) - ({lon_b})) * (({lon_a}) - ({lon_b})) + (({lat_a}) - ({lat_b})) * (({lat_a}) - ({lat_b})))"


def sql_quadkey(z: int, x_col: str = "x", y_col: str = "y") -> str:
    """Bing quadkey string of a tile: digit_i = xbit + 2*ybit, msb first."""
    digits = [
        f"CAST((({x_col} >> {z - 1 - i}) & 1) + 2 * (({y_col} >> {z - 1 - i}) & 1) AS VARCHAR)"
        for i in range(z)
    ]
    return " || ".join(digits)


def sql_interleave_ctes(
    source_cte: str,
    key_cols: str,
    x_col: str,
    y_col: str,
    out_col: str = "zval",
    prefix: str = "z",
) -> str:
    """CTE chain interleaving two INTEGER columns (x even bits, y odd)
    — the same spread steps as :func:`sql_morton_ctes` but starting
    from already-quantized ints (cells.interleave's SQL mirror).
    Select from ``{prefix}_out``."""
    ctes = [f"{prefix}_xy AS (SELECT {key_cols}, {x_col} AS mx, {y_col} AS my FROM {source_cte})"]
    prev = f"{prefix}_xy"
    for i, (shift, mask) in enumerate(_SPREAD_STEPS):
        name = f"{prefix}_s{i}"
        ctes.append(
            f"{name} AS (SELECT {key_cols}, "
            f"((mx | (mx << {shift})) & {mask}) AS mx, "
            f"((my | (my << {shift})) & {mask}) AS my FROM {prev})"
        )
        prev = name
    ctes.append(f"{prefix}_out AS (SELECT {key_cols}, (mx | (my << 1)) AS {out_col} FROM {prev})")
    return ",\n".join(ctes)
