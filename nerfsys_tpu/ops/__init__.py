"""Pure compute ops: geometry, sampling, compositing, encodings, losses."""

from nerfsys_tpu.ops.activations import trunc_exp
from nerfsys_tpu.ops.color_space import (
    color_space_transformer,
    linear_to_srgb,
    srgb_to_linear,
)
from nerfsys_tpu.ops.encodings import (
    HashGridConfig,
    frequency_encode,
    hash_grid_encode,
    hash_grid_init,
    sh_encode,
)
from nerfsys_tpu.ops.losses import compute_mse_loss, mse, psnr, psnr_from_mse
from nerfsys_tpu.ops.rays import (
    clamp_rays_near_far,
    get_ray_directions,
    get_rays,
    pack_rays,
    rays_for_camera,
    unpack_rays,
)
from nerfsys_tpu.ops.scene_box import OrientedBox, SceneBox, ray_aabb_intersect
from nerfsys_tpu.ops.volrend import (
    background_rgb,
    render_rays_stratified,
    render_weights,
    stratified_t_vals,
    volume_render,
)
