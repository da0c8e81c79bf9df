from .cells import LCO, NMC, NMC_LGM50  # noqa: F401
