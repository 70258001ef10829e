from .case import Case, Flow, build_channel_case
from .operators import nb_e, nb_w, nb_n, nb_s, divergence
from .momentum import MomentumCoeffs, momentum_coeffs, h_operator, jacobi_momentum
from .pressure import PressureCoeffs, pressure_coeffs, pressure_matvec, \
    face_fluxes_hbya, correct_fluxes, pressure_gradient
from .turbulence import TurbState, init_turbulence, sst_step
