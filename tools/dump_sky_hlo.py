import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
sys.path.insert(0, "/root/repo/tools")
from test_hoist2 import jit_hoisted  # reuse
