"""Pallas TPU kernels for the hot compute paths.

The physics itself lives in ``ops``/``models`` as pure jnp functions; a
Pallas kernel here re-invokes the same functions on VMEM-resident blocks,
so numerics are identical by construction and the kernel layer only
controls memory movement (block shape, grid, HBM<->VMEM pipelining).
"""

from .column1m import step_column_1m_pallas
from .column2m import step_column_2m_pallas, step_column_2m_pallas_packed
from .column_p3 import step_column_p3_pallas
