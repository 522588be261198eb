from dnsjax.losses.losses import (  # noqa: F401
    masked_mean,
    photometric_loss,
    depth_l1_loss,
    depth_var_loss,
    semantic_ce_loss,
    latent_distill_loss,
    tv_smoothness_loss,
    freespace_opacity_loss,
    approx_occ,
    mse2psnr,
)
