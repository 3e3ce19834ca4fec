from . import params, session, state, step
from .params import Algorithm, Fidelity, RenderParams, StaticConfig
from .session import Renderer
from .state import RenderState
