from .anchor_head_single import AnchorHeadSingle  # noqa: F401

__all__ = {
    "AnchorHeadSingle": AnchorHeadSingle,
}


def register(name, cls):
    __all__[name] = cls
