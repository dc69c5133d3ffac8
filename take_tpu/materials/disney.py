"""Real Disney BSDF lobes (Burley 2012/2015).

The reference *stubs* DisneyMetal/Glass/Sheen/BSDF as Lambertian copies and
DisneyClearcoat's eval as zero (materials/disney_*.inl ⚠). Per the project
contract we implement the real lobes here; bsdf.py dispatches to this module
when disney_mode == "full" for the tags listed in FULL_*_TAGS. Tags not yet
implemented fall back to the reference-stub behavior automatically.
"""

# Populated as lobes are implemented; empty tuple = fall back to stubs.
FULL_SAMPLE_TAGS = ()
FULL_EVAL_TAGS = ()
FULL_PDF_TAGS = ()


def sample(tag, sp, dir_in, u_lobe, u1, u2):
    raise NotImplementedError(tag)


def eval(tag, sp, dir_in, dir_out, sample_pdf):
    raise NotImplementedError(tag)


def pdf(tag, sp, dir_in, dir_out):
    raise NotImplementedError(tag)
