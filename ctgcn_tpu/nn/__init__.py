"""Model library: core CTGCN family plus the baseline model zoo.

Every model is a pure-functional module: a flax.struct dataclass of parameter
arrays (static config in non-pytree fields) with an ``__call__`` apply method,
so whole models are jit/scan/vmap-compatible pytrees.
"""

from ctgcn_tpu.nn.layers import Linear, MLP, LayerNorm  # noqa: F401
from ctgcn_tpu.nn.core_models import (  # noqa: F401
    CoreDiffusion, CDN, CGCN, CTGCN,
)
from ctgcn_tpu.nn.heads import (  # noqa: F401
    MLPClassifier, EdgeClassifier, inner_product,
)
