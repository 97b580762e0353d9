"""``python -m ipx`` entry point."""
import sys

from ipx.cli import main

sys.exit(main())
