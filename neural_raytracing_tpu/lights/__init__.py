from .lights import PointLights, Constant, LightField
