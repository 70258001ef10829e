from .engine import PisoConfig, piso_step, run_piso, courant_number, continuity_error
