"""Alias package: the framework's real name is ``ipx`` (see SURVEY.md §1.2).

``interiorpointmethod_tpu`` re-exports the full public API for discoverability
against the reference repo's name.
"""
from ipx import *          # noqa: F401,F403
from ipx import __version__  # noqa: F401
import ipx.problem as problem      # noqa: F401
import ipx.api as api              # noqa: F401
