from centerpose_tpu.geometry.affine import (  # noqa: F401
    affine_transform,
    affine_transform_points,
    get_affine_transform,
    transform_preds,
    warp_affine,
)
from centerpose_tpu.geometry.cuboid import (  # noqa: F401
    CUBOID_EDGES,
    CuboidVertexType,
    cuboid_vertices,
)
from centerpose_tpu.geometry.gaussian import (  # noqa: F401
    draw_gaussian,
    gaussian2d,
    gaussian_radius,
    render_gaussians,
)
