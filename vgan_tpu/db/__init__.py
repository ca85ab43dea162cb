"""DB construction: self-hosting the vgan database layouts.

hc_build — HaploCart DB (graph + sidecar family) from raw consensus
           FASTAs, the one-time generator role of `src/readVG.h:31-194`
           plus the mixemt-derived parents/children files.
taxa     — per-taxon soibean DB subsetting, the
           `share/vgan/soibean_dir/make_graph_files.sh` equivalent.
"""
