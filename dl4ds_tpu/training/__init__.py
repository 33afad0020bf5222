from .base import Trainer
from .supervised import SupervisedTrainer
from .cgan import CGANTrainer, load_checkpoint

__all__ = ['Trainer', 'SupervisedTrainer', 'CGANTrainer', 'load_checkpoint']
