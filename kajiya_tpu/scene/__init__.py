from .mesh import PackedMesh, Material
from .scene import Scene, Instance, load_ron_scene
from . import procedural
