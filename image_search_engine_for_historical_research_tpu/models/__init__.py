"""Descriptor models: ResNet+SOA backbone, SOLAR retrieval head, extraction."""

from .resnet import Bottleneck, FrozenBatchNorm, ResNetSOA, SOABlock
from .retrieval import OUTPUT_DIM, RetrievalModel, SolarRetrieval, init_network
from .extract import (
    DEFAULT_SCALES,
    make_extract_fn,
    make_sharded_extract_fn,
    multiscale_descriptor,
)
from .weights import convert_solar_state_dict, load_torch_checkpoint

__all__ = [
    "Bottleneck", "FrozenBatchNorm", "ResNetSOA", "SOABlock",
    "OUTPUT_DIM", "RetrievalModel", "SolarRetrieval", "init_network",
    "DEFAULT_SCALES", "make_extract_fn", "make_sharded_extract_fn",
    "multiscale_descriptor",
    "convert_solar_state_dict", "load_torch_checkpoint",
]
