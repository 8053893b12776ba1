#!/usr/bin/env python3
"""Independent GeoParquet conformance check (no engine code involved).

Reads the engine's (Geo)Parquet output back with pyarrow + a pure-
python WKB parser and verifies the contract an external consumer (OGR
/vsicurl/, geopandas — reference csw.py:65, geoapi.py:58-62) relies
on:

  * every part file's footer carries a `geo` key whose value is valid
    JSON with version / primary_column / columns[pc]
  * the primary column exists in the schema as a binary column
  * declared encoding is WKB and every value actually parses as WKB
  * declared geometry_types exactly match the types present in the
    data of that part
  * the declared per-part bbox equals the envelope recomputed from the
    part's own WKB values (exact doubles)

Usage: geocheck.py <parquet-file-or-dir> <geom-column>
Exit 0 = conformant; exit 1 with a message otherwise.
"""
import json
import math
import struct
import sys
from pathlib import Path

import pyarrow.parquet as pq

TYPE_NAMES = {1: "Point", 2: "LineString", 3: "Polygon", 4: "MultiPoint",
              5: "MultiLineString", 6: "MultiPolygon", 7: "GeometryCollection"}


def wkb_envelope(buf, off=0):
    """Return (type_name, xmin, ymin, xmax, ymax, next_offset) for the
    WKB geometry at `off`. 2D only — the engine writes 2D."""
    byte_order = buf[off]
    fmt = "<" if byte_order == 1 else ">"
    (code,) = struct.unpack_from(fmt + "I", buf, off + 1)
    base = code % 1000
    name = TYPE_NAMES.get(base)
    if name is None:
        raise ValueError(f"unknown WKB type code {code}")
    if code >= 1000:
        raise ValueError(f"non-2D WKB (code {code}) unexpected from this engine")
    off += 5
    xmin = ymin = math.inf
    xmax = ymax = -math.inf

    def take_points(n, off):
        nonlocal xmin, ymin, xmax, ymax
        for _ in range(n):
            x, y = struct.unpack_from(fmt + "dd", buf, off)
            xmin, ymin = min(xmin, x), min(ymin, y)
            xmax, ymax = max(xmax, x), max(ymax, y)
            off += 16
        return off

    if base == 1:
        off = take_points(1, off)
    elif base == 2:
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off = take_points(n, off + 4)
    elif base == 3:
        (nrings,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        for _ in range(nrings):
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off = take_points(n, off + 4)
    else:  # Multi*/GeometryCollection: recurse over child geometries
        (n,) = struct.unpack_from(fmt + "I", buf, off)
        off += 4
        for _ in range(n):
            _, cx0, cy0, cx1, cy1, off = wkb_envelope(buf, off)
            xmin, ymin = min(xmin, cx0), min(ymin, cy0)
            xmax, ymax = max(xmax, cx1), max(ymax, cy1)
    return name, xmin, ymin, xmax, ymax, off


def check_part(path, geom_col):
    md = pq.read_metadata(path)
    kv = md.metadata or {}
    geo = kv.get(b"geo")
    assert geo is not None, f"{path}: footer has no 'geo' key"
    meta = json.loads(geo.decode("utf-8"))  # must parse as JSON
    assert meta.get("version"), f"{path}: geo.version missing"
    pc = meta.get("primary_column")
    assert pc == geom_col, f"{path}: primary_column {pc!r} != {geom_col!r}"
    colmeta = meta.get("columns", {}).get(pc)
    assert colmeta is not None, f"{path}: no columns entry for {pc!r}"
    assert colmeta.get("encoding") == "WKB", f"{path}: encoding {colmeta.get('encoding')!r}"
    assert "crs" in colmeta, f"{path}: crs key absent (null means OGC:CRS84)"

    table = pq.read_table(path)
    field = table.schema.field(pc)
    assert str(field.type) in ("binary", "large_binary"), \
        f"{path}: {pc} is {field.type}, not binary"

    seen = set()
    xmin = ymin = math.inf
    xmax = ymax = -math.inf
    n_geoms = 0
    for chunk in table.column(pc).chunks:
        for v in chunk:
            if not v.is_valid:
                continue
            name, x0, y0, x1, y1, _ = wkb_envelope(v.as_py())
            seen.add(name)
            xmin, ymin = min(xmin, x0), min(ymin, y0)
            xmax, ymax = max(xmax, x1), max(ymax, y1)
            n_geoms += 1

    declared = set(colmeta.get("geometry_types", []))
    assert declared == seen, f"{path}: geometry_types {sorted(declared)} != data {sorted(seen)}"

    # GeoParquet 1.1 covering: the declared bbox struct column must
    # exist with the four named fields, each row's struct must equal
    # the envelope recomputed from its own WKB (exact doubles, null
    # geom -> null struct)
    covering = colmeta.get("covering")
    if covering is not None:
        assert meta["version"] >= "1.1.0", \
            f"{path}: covering declared by a {meta['version']} footer"
        paths = covering["bbox"]
        bcol = paths["xmin"][0]
        assert all(paths[k][0] == bcol for k in ("ymin", "xmax", "ymax")), \
            f"{path}: covering fields span columns: {paths}"
        names = [c.name for c in table.schema]
        assert bcol in names, f"{path}: covering column {bcol!r} not in schema"
        brows = table.column(bcol).to_pylist()
        grows = table.column(pc).to_pylist()
        for i, (b, g) in enumerate(zip(brows, grows)):
            if g is None:
                assert b is None, f"{path} row {i}: bbox on null geometry"
                continue
            assert b is not None, f"{path} row {i}: bbox struct missing"
            _, x0, y0, x1, y1, _ = wkb_envelope(g)
            got = [b[paths[k][1]] for k in ("xmin", "ymin", "xmax", "ymax")]
            assert got == [x0, y0, x1, y1], \
                f"{path} row {i}: covering {got} != envelope {[x0, y0, x1, y1]}"
    bbox = colmeta.get("bbox")
    if n_geoms == 0:
        assert bbox is None, f"{path}: bbox declared on a geometry-less part"
    else:
        assert bbox is not None, f"{path}: bbox missing"
        assert list(bbox) == [xmin, ymin, xmax, ymax], \
            f"{path}: bbox {bbox} != recomputed {[xmin, ymin, xmax, ymax]}"
    return n_geoms


def main():
    target, geom_col = Path(sys.argv[1]), sys.argv[2]
    parts = sorted(target.glob("*.parquet")) if target.is_dir() else [target]
    parts = [p for p in parts if not p.name.startswith("_")]
    assert parts, f"no parquet parts under {target}"
    total = sum(check_part(str(p), geom_col) for p in parts)
    print(f"geocheck OK: {len(parts)} part(s), {total} geometries")


if __name__ == "__main__":
    try:
        main()
    except AssertionError as e:
        print(f"geocheck FAILED: {e}", file=sys.stderr)
        sys.exit(1)
