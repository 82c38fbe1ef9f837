from kgc_gcn_tpu.train.optim import make_optimizer, epoch_lr
from kgc_gcn_tpu.train.loop import Trainer, train_and_evaluate
from kgc_gcn_tpu.train.checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "make_optimizer", "epoch_lr",
    "Trainer", "train_and_evaluate",
    "save_checkpoint", "load_checkpoint",
]
