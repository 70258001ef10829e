from .cg import CGResult, pcg_pressure, diag_precond
from .backends import PressureBackend, CGBackend, SurrogateBackend, HybridBackend
