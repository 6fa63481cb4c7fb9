from .qttree import (  # noqa: F401
    QtTree,
    QtTreeArr,
    assign_groups,
    find_groups,
    group_table,
    tree_rollup,
    tree_rollup_arr,
)
