from .sampler import lhs_sample, sample_block_corners, gather_training_blocks
from .trainer import TrainConfig, TrainState, train_surrogate, mse_loss_1e6
from .dataset import BlockDataset, build_block_dataset
