from .cg import CGResult, pcg_pressure, diag_precond
from .multigrid import mg_solve, mgcg_pressure, build_hierarchy
from .backends import PressureBackend, CGBackend, MGBackend, MGCGBackend, \
    SurrogateBackend, HybridBackend, AutoBackend
