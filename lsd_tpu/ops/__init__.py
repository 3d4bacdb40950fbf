from .voxelize import voxel_downsample, voxelize_dynamic
from .hashmap import VoxelHashMap, hashmap_create, hashmap_insert, hashmap_trim, hashmap_knn
from .planefit import fit_planes, point_to_plane
