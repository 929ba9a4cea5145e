"""Ring-winding normalization shared by every reader that flattens
MultiPolygon member structure into the engine's `rings` column.

The engine's flattened-ring convention (geo_writers.group_rings) infers
member boundaries from winding: a ring wound like the FIRST ring opens a
new member, an opposite-wound ring is a hole of the current member. That
only reconstructs correctly if readers emit consistent winding — but
GeoJSON in the wild routinely violates RFC 7946 ring orientation (the
reference tolerates this because geopandas/shapely carry member structure
explicitly), and WKB / GeoPackage / FlatGeobuf impose no orientation at
all. Readers therefore normalize winding HERE, while the member structure
is still explicit in the source format: outer rings CW, holes CCW — the
shapefile-spec convention the .shp reader already emits natively.
"""

from __future__ import annotations


def ring_cw(vs) -> bool:
    """True if the (open) ring winds clockwise (signed shoelace area < 0),
    matching geo_writers._ring_cw / shapefile._ring_is_cw sign convention.
    Accepts a list of [x, y] or an (N, 2) array."""
    s = 0.0
    n = len(vs)
    for i in range(n):
        x1, y1 = vs[i][0], vs[i][1]
        j = i + 1 if i + 1 < n else 0
        x2, y2 = vs[j][0], vs[j][1]
        s += float(x1) * float(y2) - float(x2) * float(y1)
    return s < 0


def wind_member(rings: list) -> list:
    """One member's [outer, *holes] open rings → outer CW, holes CCW.
    Rings may be vertex lists or (N, 2) arrays; a ring is reversed (copy,
    via [::-1]) only when its winding disagrees with its role. Degenerate
    rings (< 3 vertices) pass through untouched."""
    out = []
    for i, vs in enumerate(rings):
        want_cw = i == 0
        if len(vs) >= 3 and ring_cw(vs) != want_cw:
            vs = vs[::-1]
        out.append(vs)
    return out
