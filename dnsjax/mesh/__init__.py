from dnsjax.mesh.marching import marching_tetrahedra  # noqa: F401
from dnsjax.mesh.export import write_ply  # noqa: F401
from dnsjax.mesh.mesher import Mesher  # noqa: F401
