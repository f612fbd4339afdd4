from .torch_import import variables_from_torch  # noqa: F401
