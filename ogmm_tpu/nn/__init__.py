from ogmm_tpu.nn.layers import ConvHead, PointMLP
from ogmm_tpu.nn.dgcnn import DGCNN
from ogmm_tpu.nn.attention import (MultiHeadAttention, PositionEncoding,
                                   TransformerBlock)
from ogmm_tpu.nn.gmmreg import GMMReg, gmm_svd
from ogmm_tpu.nn.deepgmr import DeepGMR, gmm_register

__all__ = [
    "ConvHead", "PointMLP", "DGCNN", "MultiHeadAttention", "PositionEncoding",
    "TransformerBlock", "GMMReg", "gmm_svd", "DeepGMR", "gmm_register",
]
