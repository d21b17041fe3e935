from .exact import ExactGPModel
