"""In-circuit mirrors of the crypto primitives.

Mirror of the reference `primitives/src/circuit/` subsystem: Rescue
permutation/sponge gadgets, Merkle membership gadgets, Schnorr signature
verification, ElGamal encryption, commitment and PRF gadgets.  Importing the
submodules attaches their methods to `PlonkCircuit`.
"""

from . import rescue      # noqa: F401
from . import commitment  # noqa: F401
from . import prf         # noqa: F401
from . import merkle      # noqa: F401
from . import schnorr     # noqa: F401
from . import elgamal     # noqa: F401
