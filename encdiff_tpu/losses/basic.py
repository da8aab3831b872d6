"""Trivial loss stand-ins used by reference configs."""


class IdentityLoss:
    """Stand-in for ``lossconfig: {target: torch.nn.Identity}`` — the LDM
    stage's first-stage loss is unused (shapes3d-vq-4-16-encdiff.yaml:78)."""

    def __init__(self, *args, **kwargs):
        pass

    def __call__(self, x, *args, **kwargs):
        return x
