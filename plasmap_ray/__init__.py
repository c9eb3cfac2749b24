"""plasmap_ray — a Ray-Data-native spatial-join + tiling engine.

Ground-up rebuild of the capabilities of BranislavLazic/plasmap (Scala /
Akka Streams OSM query engine) on ray.data.Dataset streaming execution:

- 64-bit Morton (z-order) cell index with a precision ladder
  (reference: geow GeoHash, used at util/GeoCalculator.scala:28-61)
- slippy-map tiles (z/x/y, quadkey) as the raster<->vector bridge
- point-in-polygon broadcast spatial joins (reference:
  query-engine/Queries.scala:304-341)
- kNN / radius joins (reference: Queries.scala:211-262)
- ways->rings->polygon assembly (reference: processing/WayFlow.scala,
  RelationFlow.scala)
- tiling aggregation with explicit skew salting
- exact + approximate dedup, text analysis, ANN similarity search
- checkpointed, resumable partitioned parquet output

All hot-path kernels are vectorized NumPy / pyarrow.compute over
zero-copy Arrow batches; stateful stages are actor pools.
"""

__version__ = "0.1.0"
