from .engine import PisoConfig, piso_step, run_piso, run_piso_chunked, \
    piso_step_sst, run_piso_sst, courant_number, continuity_error
