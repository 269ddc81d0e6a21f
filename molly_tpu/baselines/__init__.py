from .model import BaselineConfig, forward_logits, init_params, loss_fn
from .dataset import ClassificationDataset, collate
