from .attention import AttentionFusion, TransformerEncoder
from .policy import Critic, ImgEncoder, MultiObsEmbedding

__all__ = ["AttentionFusion", "TransformerEncoder", "Critic", "ImgEncoder",
           "MultiObsEmbedding"]
