from .grid_subsample import grid_subsample
