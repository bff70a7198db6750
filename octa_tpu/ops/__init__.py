from octa_tpu.ops.raster import (  # noqa: F401
    edge_dropout,
    forest_to_arrays,
    pad_edges,
    parse_graph_csv,
    rasterize_forest,
    splat_capsules_3d,
    splat_lines_2d,
    voxelize_forest,
)
