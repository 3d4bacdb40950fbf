// boost::bind is included but not used by the reference IKFoM headers.
#pragma once
