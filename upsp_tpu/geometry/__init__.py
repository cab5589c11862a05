"""Geometry layer: surface models, BVH build, visibility primitives."""

from upsp_tpu.geometry.grids import (  # noqa: F401
    SurfaceModel,
    from_struct_grid,
    from_tri_mesh,
    load_model,
    triangle_normals_areas,
    find_overlapping_nodes,
)
