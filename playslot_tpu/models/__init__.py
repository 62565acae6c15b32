"""Model zoo: SAVi, predictors (PlaySlot/OCVP family), downstream heads."""

from playslot_tpu.models.savi import SAVi  # noqa: F401
