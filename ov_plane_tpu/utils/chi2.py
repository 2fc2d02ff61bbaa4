"""Precomputed chi-squared 95% quantile table.

The reference evaluates ``boost::math::quantile(chi_squared(dof), 0.95)`` at
runtime for every gate (e.g. UpdaterMSCKF.cpp:57-62 builds a 1..500 table;
StateHelper.cpp:471-473 evaluates on the fly). Data-dependent special-function
evaluation doesn't belong inside a jitted TPU program, so we bake a static
table at import (SciPy, float64) and gates index it with a clipped dof.
"""

from __future__ import annotations

import numpy as np
from scipy.stats import chi2 as _chi2

MAX_DOF = 1024

# chi2_095_table[d] = 95% quantile for d dof; d=0 slot holds dof-1 value so a
# clamped gather never produces nonsense for masked-out (zero-measurement) rows.
_table = _chi2.ppf(0.95, np.arange(1, MAX_DOF + 1))
CHI2_095_TABLE = np.concatenate([[_table[0]], _table]).astype(np.float64)


def chi2_quantile_095(dof):
    """Look up the 95% chi2 quantile for (possibly traced, integer) dof.

    Accepts jnp arrays; clamps dof to [1, MAX_DOF].
    """
    import jax.numpy as jnp

    table = jnp.asarray(CHI2_095_TABLE)
    return table[jnp.clip(dof, 1, MAX_DOF)]
