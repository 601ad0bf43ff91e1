from .types import SimState, ModelParams
from .scene_model import SceneModel
from .step import Engine
from .model import Articulation, build_articulation, primitive_articulation
from .urdf import parse_urdf, GEOM_SPHERE, GEOM_BOX, GEOM_CAPSULE
