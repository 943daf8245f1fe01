from .standard import tokenize, lowercase, analyze

__all__ = ["tokenize", "lowercase", "analyze"]
