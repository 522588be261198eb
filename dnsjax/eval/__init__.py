from dnsjax.eval.ate import align_horn, evaluate_ate  # noqa: F401
from dnsjax.eval.render_metrics import psnr, ssim, ms_ssim  # noqa: F401
from dnsjax.eval.semantic import semantic_metrics  # noqa: F401
from dnsjax.eval.mesh_metrics import mesh_metrics  # noqa: F401
