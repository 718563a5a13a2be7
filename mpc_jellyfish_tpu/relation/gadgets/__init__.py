"""In-circuit gadget library for the TPU Plonk constraint system.

Mirrors the reference's `relation/src/gadgets/` modules (cmp, ecc, emulated
field, mod_arith, non-native gates, arithmetic extras).  Importing this
package attaches the gadget methods to `PlonkCircuit`; `relation/__init__.py`
imports it so they are always available.
"""

from . import cmp        # noqa: F401
from . import arith      # noqa: F401
from . import ecc        # noqa: F401
from . import emulated   # noqa: F401
from . import mod_arith  # noqa: F401
from . import non_native_gates  # noqa: F401
from . import conversion  # noqa: F401
