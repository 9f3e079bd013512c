from .options import (
    parse,
    dict_to_nonedict,
    NoneDict,
    check_resume,
    ordered_yaml,
    dict2str,
)

__all__ = [
    "parse",
    "dict_to_nonedict",
    "NoneDict",
    "check_resume",
    "ordered_yaml",
    "dict2str",
]
