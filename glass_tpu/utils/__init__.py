from .common import rgb2grey, flatten_dict, unflatten_dict
