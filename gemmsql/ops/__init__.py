"""Reference operator inventory (SURVEY.md §2), Spark-first."""

from gemmsql.ops.matmul import coo_matmul, gram, relu_matmul, vector_matmul
from gemmsql.ops.attention import attention_blocked, attention_coo
from gemmsql.ops.mlp import mlp
from gemmsql.ops.xentropy import xentropy
from gemmsql.ops.entropy import row_entropy
from gemmsql.ops.sampling import sample_categorical

__all__ = [
    "coo_matmul",
    "gram",
    "relu_matmul",
    "vector_matmul",
    "attention_blocked",
    "attention_coo",
    "mlp",
    "xentropy",
    "row_entropy",
    "sample_categorical",
]
