from fosvos_tpu.parallel import data_parallel, fanout, mesh
from fosvos_tpu.parallel.mesh import make_mesh

__all__ = ['data_parallel', 'fanout', 'mesh', 'make_mesh']
