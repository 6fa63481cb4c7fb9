from .qttree import QtTree, tree_rollup, find_groups, assign_groups  # noqa: F401
