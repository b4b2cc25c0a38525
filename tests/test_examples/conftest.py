import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))
from conftest import *  # noqa: F401,F403 (forces CPU backend)

EXAMPLES_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), '..', '..', 'examples'))
