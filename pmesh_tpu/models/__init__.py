from .cosmology import Cosmology, Planck15  # noqa: F401
from .fastpm import Solver, State  # noqa: F401
from .powerspectrum import EHPower, PowerSpectrum  # noqa: F401
