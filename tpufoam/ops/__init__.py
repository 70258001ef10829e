from .stencil import (pallas_available_for, stencil_matvec_pallas,
                      jacobi_sweep_pallas, jacobi_multisweep_pallas,
                      momentum_multisweep_pallas)
