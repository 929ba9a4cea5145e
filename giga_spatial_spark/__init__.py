"""giga_spatial_spark — a from-scratch, PySpark-native spatial enrichment
and zonal-aggregation engine.

Reproduces the query semantics of unicef/giga-spatial (reference at
/root/reference, v0.9.8) re-expressed Spark-first: DataFrame/SQL plans
optimized by Catalyst/AQE, cell-cover equi-joins for spatial theta-joins,
and vectorized Arrow (pandas) UDFs for the geometric refine kernels.
No shapely/geopandas/h3 dependency — all geometry is pure numpy.

Layout:
  session      — SparkSession factory (AQE, Arrow, shuffle sizing)
  geometry     — numpy geometry kernels (haversine, PIP, clip, area)
  cells        — Web-Mercator tile / quadkey native column expressions,
                 k-ring, polygon covers (analog of reference grid/ modules)
  cells_h3     — geodesic H3 from the public spec (REAL H3 indexes,
                 doc-example bit-exact), Arrow assign kernel, polyfill,
                 grid_disk, hierarchy, exact cell areas
  cells_s2     — from-scratch S2 (Hilbert curve), cells_hex — planar
                 axial grid (pure-arithmetic codegen variant)
  iso3166      — complete ISO 3166-1 registry (no pycountry)
  synth        — deterministic synthetic geocoding + admin/facility layers
  operators/   — pip_join, zonal, knn, range_join, overlay, dedup,
                 normalize, ann
  functions/   — text (html→text, tokenize, lang-id, quality), hashing
                 (minhash/simhash), vectors (cosine / dot)
  sources/     — webpages generator, format-dispatch readers, GeoTIFF
                 codec + COG sink (8 CRS families incl. user-defined
                 GeoKey parameters)
  plans/       — lineage checkpoint / resume manifests
  streaming/   — structured-streaming pipelines over the events table
"""

__version__ = "0.1.0"
