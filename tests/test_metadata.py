"""Zero-shot metadata constants (reference zero_shot_metadata.py:88-270 and
zero_shot_metadata_other.py:88-117): the class-name/template data contract
the zero-shot classifiers are built from."""

from xtagclip_tpu.train import metadata


def test_scar_and_medmnist_constants():
    assert tuple(metadata.SCAR_CLASSNAMES) == (
        "Others", "Hypertrophic scar", "Keloid scar")
    assert len(metadata.PATHMNIST_CLASSNAMES) == 9
    assert "Adipose" in metadata.PATHMNIST_CLASSNAMES
    assert len(metadata.MEDICALMNIST_CLASSNAMES) == 6
    assert len(metadata.SIMPLE_SCAR_TEMPLATES) == 5
    assert len(metadata.SIMPLE_MEDICALMNIST_TEMPLATES) == 4


def test_imagenet_constants():
    assert len(metadata.IMAGENET_CLASSNAMES) == 1000
    assert len(metadata.OPENAI_IMAGENET_TEMPLATES) == 80
    assert len(metadata.SIMPLE_IMAGENET_TEMPLATES) == 7


def test_format_template():
    assert metadata.format_template("a photo of {}.", "x") == "a photo of x."
    # templates without a placeholder get the classname appended
    assert metadata.format_template("A ", "dog") == "A dog"


def test_unknown_attribute_raises():
    import pytest

    with pytest.raises(AttributeError):
        metadata.NO_SUCH_CONSTANT
