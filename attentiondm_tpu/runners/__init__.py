from .diffusion import Diffusion

__all__ = ["Diffusion"]
