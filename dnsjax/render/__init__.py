from dnsjax.render.sampling import sample_along_rays  # noqa: F401
from dnsjax.render.composite import composite_rays  # noqa: F401
