"""Iterative solvers built on the framework's SpMV kernels.

The reference project stops at the SpMV benchmark; these show the kernels
as a production surface: fully jit-compiled iteration loops
(``lax.while_loop``, no host round-trips per step) over any of the
framework's matvec implementations.
"""

from .bicgstab import bicgstab
from .cg import cg, cg_multi, cg_sell, jacobi_preconditioner
from .chebyshev import (chebyshev_preconditioner, chebyshev_smooth,
                        gershgorin_bounds)
from .gmres import gmres
from .lanczos import lanczos, lanczos_bounds, lanczos_extremal
from .power import pagerank, pagerank_operator, power_iteration
from .refine import iterative_refinement
from .subspace import subspace_iteration

__all__ = ["cg", "cg_multi", "cg_sell", "jacobi_preconditioner", "bicgstab",
           "gmres", "power_iteration", "pagerank", "pagerank_operator",
           "iterative_refinement", "subspace_iteration",
           "chebyshev_preconditioner", "chebyshev_smooth",
           "gershgorin_bounds",
           "lanczos", "lanczos_extremal", "lanczos_bounds"]
