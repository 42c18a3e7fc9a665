from .writer import Writer
from .progress import Bar
