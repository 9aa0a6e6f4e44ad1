"""Training: losses over tuples, param-group optimizer, jitted/sharded step."""

from .optim import FROZEN_PREFIXES, make_optimizer, param_labels
from .step import TrainState, init_train_state, make_loss_fn, make_train_step
from .tuples import TupleSpec, TuplesDataset, batch_tuples, tuples_from_db_pickle, whiten_db_from_pickle, tuples_from_folders
from .trainer import EpochMetrics, TrainConfig, Trainer, make_retrieval_eval
from .loftr import (
    LoFTRTrainState,
    init_loftr_train_state,
    make_loftr_optimizer,
    make_loftr_train_step,
    random_homography,
    warp_image,
)

__all__ = [
    "FROZEN_PREFIXES", "make_optimizer", "param_labels",
    "TrainState", "init_train_state", "make_loss_fn", "make_train_step",
    "TupleSpec", "TuplesDataset", "batch_tuples", "tuples_from_db_pickle", "whiten_db_from_pickle", "tuples_from_folders",
    "EpochMetrics", "TrainConfig", "Trainer", "make_retrieval_eval",
    "LoFTRTrainState", "init_loftr_train_state", "make_loftr_optimizer",
    "make_loftr_train_step", "random_homography", "warp_image",
]
