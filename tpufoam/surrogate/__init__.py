from .blocks import BlockLayout, build_block_layout, extract_blocks, \
    block_zero_mean, assemble_scan, assemble_lstsq, gaussian_filter2d
from .pca import StreamingPCA, PCAModel, fit_pca_exact
from .features import FamilyConfig, FAMILIES
from .pipeline import SurrogateBundle, make_predictor
