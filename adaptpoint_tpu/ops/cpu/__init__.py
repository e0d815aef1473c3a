from .grid_subsample import grid_subsample
from .kdtree_knn import kdtree_knn, knn_search
