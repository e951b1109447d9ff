from .besselk import besselk, besselkxv
