"""Operator library (rebuild of ``src/toast/ops/``)."""

from .map_products import (
    BuildPixelDistribution,
    CadenceMap,
    CrossLinking,
    PointingDetectorFP,
)
from .mapmaker import Calibrate, MapMaker
from .mapmaker_binning import BinMap
from .mapmaker_solve import SolverLHS, SolverRHS, solve
from .mapmaker_templates import ApplyAmplitudes, SolveAmplitudes, TemplateMatrix
from .mapmaker_utils import (
    BuildHitMap,
    BuildInverseCovariance,
    BuildNoiseWeighted,
    CovarianceAndHits,
    NoiseWeight,
)
from .demodulation import Demodulate, StokesWeightsDemod
from .elevation_noise import ElevationNoise
from .external import (
    LoadSpt3g,
    SimTEBConviqt,
    SimWeightedConviqt,
    Madam,
    RunSpt3g,
    SaveSpt3g,
    SimConviqt,
    madam_params_from_mapmaker,
)
from .scan_alm import ScanAlm, SimTotalconvolve
from .filterbin import FilterBin, ObsMat
from .flag_ops import (
    AzimuthIntervals,
    AzimuthRanges,
    ExtendFlags,
    FlagIntervals,
    FlagNaNs,
    FlagSSO,
    YieldCut,
)
from .housekeeping import (
    CalibrateDetectors,
    Combine,
    Copy,
    Delete,
    Detrend,
    MemoryCounter,
    Reset,
    Statistics,
    WeatherModel,
)
from .sim_sky import SimCatalog, SimDipole, SimScanSynchronousSignal
from .sim_systematics import (
    CommonModeNoise,
    CrossTalk,
    DecimateFocalplane,
    MitigateCrossTalk,
    GainDrifter,
    GainScrambler,
    InjectCosmicRays,
    PerturbHWP,
    TimeConstant,
)
from .groundfilter import GroundFilter
from .hwpfilter import HWPFilter
from .noise_estimation import NoiseEstim
from .noise_model import (
    DefaultNoiseModel,
    FitNoiseModel,
    FlagNoiseFit,
    SignalDiffNoiseModel,
)
from .polyfilter import CommonModeFilter, PolyFilter, PolyFilter2D
from .sim_atm import SimAtmosphere
from .tod_cleaning import (
    FillGaps,
    NoiseFilter,
    SimpleDeglitch,
    SimpleJumpCorrect,
    SimpleStatCut,
)
from .sim_ground import SimGround
from .operator import Operator, Pipeline
from .hwpss_model import DemodCommonModeFilter, HWPSynchronousModel, T2PFilter
from .pixels_healpix import PixelsHealpix
from .pixels_wcs import PixelsWCS
from .pointing_detector import PointingDetectorSimple
from .save_load_hdf5 import LoadHDF5, SaveHDF5
from .scan_healpix import (
    InterpolateHealpixMap,
    ScanHealpixDetectorMap,
    ScanHealpixMap,
    ScanHealpixMask,
)
from .scan_map import ScanMap, ScanMask, ScanScale
from .scan_wcs import ScanWCSDetectorMap, ScanWCSMap, ScanWCSMask
from .sim_noise import SimNoise
from .sim_satellite import SimSatellite
from .stokes_weights import StokesWeights
