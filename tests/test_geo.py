"""Geo functions: geohash encode/decode vs an independent classic
subdivision reference; pointInPolygon vs hand-checked points."""

from pyspark.sql import functions as F

from clickhouse_clickhouse_spark.functions.geo import (
    GEOHASH_ALPHABET, geohash_decode, geohash_encode, point_in_polygon,
)


def ref_geohash(lat, lon, precision):
    """Classic interval-subdivision geohash (public algorithm as on
    geohash.org / Wikipedia) — structurally unlike the morton form."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_lo = mid
            else:
                ch = ch * 2
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_lo = mid
            else:
                ch = ch * 2
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GEOHASH_ALPHABET[ch])
            bits, ch = 0, 0
    return "".join(out)


POINTS = [(57.64911, 10.40744), (38.897, -77.036), (-33.8568, 151.2153),
          (0.0001, 0.0001), (-89.9, -179.9), (89.9, 179.9)]

L_POLY = [(0.0, 0.0), (10.0, 0.0), (10.0, 4.0), (4.0, 4.0),
          (4.0, 10.0), (0.0, 10.0)]


def test_geohash_matches_subdivision_reference(spark):
    rows = spark.createDataFrame(
        [(la, lo) for la, lo in POINTS], "lat double, lon double")
    got = rows.select(
        geohash_encode(F.col("lon"), F.col("lat"), 6).alias("gh")).collect()
    want = [ref_geohash(la, lo, 6) for la, lo in POINTS]
    assert [r.gh for r in got] == want
    assert want[0] == "u4pruy"  # canonical published example (Jutland)


def test_geohash_decode_center_within_cell(spark):
    rows = spark.createDataFrame(
        [(la, lo) for la, lo in POINTS], "lat double, lon double")
    d = rows.select(
        "lat", "lon",
        geohash_decode(geohash_encode(F.col("lon"), F.col("lat"), 6),
                       6).alias("c"))
    for r in d.collect():
        # precision-6 even-split cell: 360/2^15 lon, 180/2^15 lat
        assert abs(r.c.lon - r.lon) <= 360.0 / (1 << 15) / 2 + 1e-9
        assert abs(r.c.lat - r.lat) <= 180.0 / (1 << 15) / 2 + 1e-9


def test_point_in_polygon_hand_checked(spark):
    cases = [((2.0, 2.0), True), ((8.0, 2.0), True), ((8.0, 8.0), False),
             ((2.0, 8.0), True), ((5.0, 5.0), False), ((-1.0, 5.0), False),
             ((3.9, 9.9), True), ((10.5, 2.0), False)]
    rows = spark.createDataFrame(
        [(x, y) for (x, y), _ in cases], "x double, y double")
    got = rows.select(
        point_in_polygon(F.col("x"), F.col("y"), L_POLY).alias("i")).collect()
    assert [r.i for r in got] == [want for _, want in cases]


def test_tile_quadkey_hierarchy_and_hex_roundtrip(spark):
    """Quadkey of an ancestor cell is a string prefix of its
    descendants' (the hierarchy/rollup property); hex_bin maps each
    cell's own center point back to that cell id."""
    import math

    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.geo import (
        hex_bin, lat_lng_to_tile, tile_quadkey,
    )

    pts = [(i, -70.0 + i * 7.3, -170.0 + i * 17.1) for i in range(20)]
    df = spark.createDataFrame(pts, "i long, lat double, lon double")
    t7 = lat_lng_to_tile(F.col("lat"), F.col("lon"), 7)
    t4 = lat_lng_to_tile(F.col("lat"), F.col("lon"), 4)
    out = df.select(
        tile_quadkey(t7["tx"], t7["ty"], 7).alias("qk7"),
        tile_quadkey(t4["tx"], t4["ty"], 4).alias("qk4")).collect()
    assert all(len(r.qk7) == 7 and r.qk7.startswith(r.qk4) for r in out)

    # hex centers -> lat/lng -> hex_bin must return the original cell
    R, size = 6378137.0, 250_000.0
    cells = [(q, r) for q in (-3, 0, 2, 5) for r in (-2, 0, 4)]
    rows = []
    for q, r in cells:
        mx = size * math.sqrt(3.0) * (q + r / 2.0)
        my = size * 1.5 * r
        lon = math.degrees(mx / R)
        lat = math.degrees(2.0 * math.atan(math.exp(my / R)) - math.pi / 2.0)
        rows.append((q, r, lat, lon))
    hdf = spark.createDataFrame(rows, "q long, r long, lat double, lon double")
    got = hdf.select("q", "r",
                     hex_bin(F.col("lat"), F.col("lon"), size).alias("h")) \
             .collect()
    assert all(r.h.hq == r.q and r.h.hr == r.r for r in got)


def test_hex_kring_disc(spark):
    """kRing(0) is the cell itself; kRing(1) is the 7-cell disc whose
    non-center members are exactly the 6 axial neighbors; kRing(2) has
    3*4+2*2+... = 19 cells; every member is within hex distance k."""
    from pyspark.sql import functions as F

    from clickhouse_clickhouse_spark.functions.geo import hex_kring

    df = spark.createDataFrame([(2, -1)], "q long, r long")
    r0, r1, r2 = df.select(
        hex_kring(F.col("q"), F.col("r"), 0).alias("k0"),
        hex_kring(F.col("q"), F.col("r"), 1).alias("k1"),
        hex_kring(F.col("q"), F.col("r"), 2).alias("k2")).first()
    assert [(c.hq, c.hr) for c in r0] == [(2, -1)]
    cells1 = {(c.hq, c.hr) for c in r1}
    neigh = {(3, -1), (3, -2), (2, -2), (1, -1), (1, 0), (2, 0)}
    assert cells1 == neigh | {(2, -1)} and len(r1) == 7
    assert len(r2) == 19

    def hexdist(a, b):
        dq, dr = a[0] - b[0], a[1] - b[1]
        return max(abs(dq), abs(dr), abs(dq + dr))
    assert all(hexdist((c.hq, c.hr), (2, -1)) <= 2 for c in r2)
