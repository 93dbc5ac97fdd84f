from gasr_tpu.ops.linear import linear, linear_init  # noqa: F401
from gasr_tpu.ops.rnn import (  # noqa: F401
    rnn_cell, rnn_cell_init, rnn_forward, rnn_init,
)
