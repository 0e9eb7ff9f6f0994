from .optim import make_optimizer, kl_lambda
from .step import make_train_step, make_eval_step, loss_terms
from .solver import Solver
from .logger import Logger

__all__ = [
    "make_optimizer",
    "kl_lambda",
    "make_train_step",
    "make_eval_step",
    "loss_terms",
    "Solver",
    "Logger",
]
